from simka_tpu.ops.kmers import extract_canonical_kmers  # noqa: F401
from simka_tpu.ops.intmatmul import exact_int_matmul  # noqa: F401
