from .cpg_index import CpGIndex, build_from_fasta, find_cpg_loci
from .refdir import Genome, genome_dir, references_root, set_default_ref
from .region import GenomicRegion
from .init_genome import init_genome
