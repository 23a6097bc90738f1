from simka_tpu.utils.metrics import Metrics, StageTimer  # noqa: F401
