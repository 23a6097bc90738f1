from simka_tpu.io.dsl import Dataset, parse_input_file, parse_input_text  # noqa: F401
from simka_tpu.io.bank import (  # noqa: F401
    count_dataset_reads,
    encode_batch,
    iter_dataset_reads,
    read_dataset,
    read_sequences,
    shannon_index_read,
)
