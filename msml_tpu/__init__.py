"""msml_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
ygtxr1997/MSML (AAAI-2022 occlusion-robust face recognition).

Built from scratch for TPU: NHWC layouts for the MXU, bf16 compute / f32 params,
SPMD over a jax.sharding.Mesh (data + class-sharded PartialFC softmax), an
on-device Pallas augmentation kernel (kernels/augment.py; candidate compute
kernels are measured against XLA's lowering and shipped only when they win —
see PERF.md / benchmarks/negative/), and a host-side C++ tool library for
offline prep.

Reference capability map: see SURVEY.md at the repo root; every public module
docstring cites the reference file:line it provides parity with.
"""

__version__ = "0.1.0"
