from .mesh import make_mesh, pad_to_multiple
from .sharded import bucket_fragments, build_analysis_step
