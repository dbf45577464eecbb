from .sharded import ShardedNDDWT, make_mesh
from .sharded_fft import ShardedFFTNDDWT

__all__ = ["ShardedNDDWT", "ShardedFFTNDDWT", "make_mesh"]
