from .log import eprint, logger
from .files import (
    splitextgz,
    pretty_name,
    delete_or_skip,
    safe_remove,
    mkdirp,
    validate_single_file,
    validate_file_list,
    IllegalArgumentError,
)


def outer_add(col, n, dtype=None):
    """col[:, None] + arange(n) materialized the fast way.

    numpy's outer-broadcast ufunc path ((N,1)+(1,n)) runs ~25x slower than
    fill-then-add on this host (short inner loops dominated by per-row
    dispatch); hot decode paths build index matrices through this helper.
    """
    import numpy as np

    col = np.asarray(col)
    dtype = np.dtype(dtype or col.dtype)
    out = np.empty((col.shape[0], n), dtype=dtype)
    out[:] = np.arange(n, dtype=dtype)
    out += col[:, None].astype(dtype, copy=False)
    return out
