from .hashing import h64, shingle_hashes  # noqa: F401
from .stable import stabilize_doubles  # noqa: F401
