"""rerun no-op shim: any attribute access returns a callable no-op."""


class _Noop:
    def __call__(self, *a, **k):
        return None

    def __getattr__(self, name):
        return _Noop()


def __getattr__(name):
    return _Noop()
