from podtpu.export.stablehlo import export_stablehlo, load_exported  # noqa: F401
from podtpu.export.weights import (  # noqa: F401
    load_npz_weights,
    save_npz_weights,
)
