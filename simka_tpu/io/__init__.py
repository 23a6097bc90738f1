from simka_tpu.io.dsl import Dataset, parse_input_file, parse_input_text  # noqa: F401
from simka_tpu.io.bank import (  # noqa: F401
    read_sequences,
    read_dataset,
    encode_batch,
    shannon_index_read,
)
