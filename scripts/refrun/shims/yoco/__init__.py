"""yoco shim backed by this repo's yoco-compatible config module."""

import sys
import pathlib

_REPO = pathlib.Path(__file__).resolve().parents[3]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from neural_graph_mapping_tpu import config as _cfg  # noqa: E402

load_config = _cfg.load_config
resolve_path = _cfg.resolve_path
save_config_to_file = _cfg.save_config_to_file


def load_config_from_args(parser=None, search_paths=None):
    # reference passes an argparse parser; our impl parses sys.argv directly
    return _cfg.load_config_from_args(sys.argv[1:], search_paths=search_paths)
