from .pat2beta import pat2beta, pat2beta_counts
from .bam2pat_run import bam2pat
