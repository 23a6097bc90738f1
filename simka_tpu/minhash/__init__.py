from simka_tpu.minhash.sketch import compute_sketch  # noqa: F401
from simka_tpu.minhash.sketch_file import SketchFile  # noqa: F401
