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
