from simka_tpu.core.stats import SimkaStatistics  # noqa: F401
from simka_tpu.core.distances import compute_all_matrices  # noqa: F401
from simka_tpu.core.output import dump_matrix_csv_gz, format_matrix_csv  # noqa: F401
