from .pileup import pileup_xla, pileup_frags
from .reduceat import reduce_data_to_blocks
