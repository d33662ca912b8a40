from .bgzf import BgzfReader, BgzfWriter, open_maybe_gzip
from .beta import (
    load_beta,
    save_beta,
    trim_to_uint,
    beta2vec,
    merge_betas,
    beta_sanity_check,
)
from .pat import (
    PatFrags,
    read_pat,
    write_pat,
    index_pat,
    parse_pat_bytes,
    frags_to_bytes,
    pack_codes,
    unpack_codes,
    CODE_T,
    CODE_C,
    CODE_H,
    CODE_DOT,
)
from .blocks import load_blocks, write_blocks, is_block_file_nice, sites_blocks
