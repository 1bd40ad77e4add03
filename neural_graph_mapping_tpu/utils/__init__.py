from neural_graph_mapping_tpu.utils import transforms  # noqa: F401
