"""nerf_signature_tpu — a TPU-native (JAX/XLA/Pallas) NeRF-watermarking framework.

From-scratch re-design of the capabilities of luo-ziyuan/NeRF_Signature
("The NeRF Signature: Codebook-Aided Watermarking for Neural Radiance Fields",
TPAMI 2025) for TPU hardware:

  * instant-NGP NeRF (multiresolution hash encoding + tiny MLPs + occupancy-grid
    accelerated ray marching) — reference: ``hash_encoding.py``,
    ``nerf/network_hash.py``, ``nerf/renderer.py``, ``raymarching/``.
  * Codebook message hash-encoder watermarking + HiDDeN bit extractor —
    reference: ``hash_encoding_wtmk_bit.py``, ``nerf/network_wtmk_tcnn.py``,
    ``nerf/hidden_models.py``, ``nerf/utils_wtmk_disen.py``.

Design notes (TPU-first, not a port):
  * All compute-path code is pure-functional JAX: params are pytrees, train
    steps are single jitted programs, shapes are static.
  * The reference's CUDA atomically-compacted ray marching is replaced with a
    static-budget formulation: a per-ray candidate t-grid + occupancy-bitfield
    gather + ``top_k`` compaction to a fixed per-ray sample budget
    (see ``ops/marching.py``). Deterministic, no atomics, no host syncs.
  * Alpha compositing uses the exact log-transmittance cumsum identity
    (``T_i = exp(-cumsum(sigma*delta))``), so the analytic gradient of the
    reference's hand-written backward kernel falls out of autodiff
    (see ``ops/composite.py``).
  * Scale-out is a 1-D ``jax.sharding.Mesh`` over the ray axis; gradients
    all-reduce over ICI (see ``parallel/``).
"""

__version__ = "0.1.0"
