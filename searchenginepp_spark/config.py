"""Engine constants, kept identical to the reference where semantics demand.

Reference cites:
  BM25 k1=0.82, b=0.68        /root/reference/src/index/query_scorer.hpp:65
  skip-block size 15000       /root/reference/src/builder.cpp:24
  docids start at 1           /root/reference/src/builder.cpp:278
  token length cap 240        /root/reference/src/normalizer/WordNormalizer.cpp:64
  top-k default 10            /root/reference/src/util/engine_options.hpp:10
"""

BM25_K1 = 0.82
BM25_B = 0.68
SKIP_BLOCK_SIZE = 15_000
DOCID_START = 1
MAX_TOKEN_LEN = 240
DEFAULT_TOP_K = 10

# Index-build shuffle shape. Head terms (code stopword-likes) are salted into
# SALT_BUCKETS sub-lists when their df exceeds SALT_DF_THRESHOLD, then merged.
SALT_DF_THRESHOLD = 1_000_000
SALT_BUCKETS = 32
