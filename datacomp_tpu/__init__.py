"""datacomp-tpu: a TPU-native chunked canonical-Huffman compression framework.

Brand-new JAX/XLA/Pallas re-architecture of the capabilities of the Java/
TornadoVM reference "DataComp"
(vuyraj/Data-Compression-Implementing-GPU-Driven-Huffman-Encoding-in-Java):
chunked canonical Huffman compression with a bit-compatible `.dcz` footer-last
container, SHA-256 integrity, CLI, per-stage metrics, CPU↔TPU service
selection with graceful fallback, and a benchmark suite — scaled across TPU
chips/hosts via `jax.sharding` data parallelism over chunks.
"""

__version__ = "0.1.0"
