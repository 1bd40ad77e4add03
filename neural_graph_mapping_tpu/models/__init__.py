from neural_graph_mapping_tpu.models.fields import NeuralField, NeuralFieldSet  # noqa: F401
