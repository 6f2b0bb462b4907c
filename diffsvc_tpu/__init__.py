"""diffsvc_tpu — a TPU-native (JAX/XLA/Pallas/pjit) singing-voice-conversion framework.

A ground-up rebuild of the capabilities of prophesier/diff-svc (reference layout
documented in SURVEY.md) designed TPU-first:

- pure-functional model core (params are pytrees, every stage is a jittable
  ``f(params, cfg, batch, rng) -> out``),
- the DDPM/PLMS sampling loop is a single ``jax.lax.scan`` (no Python loop),
- data parallelism via ``jax.sharding.Mesh`` + NamedSharding (no DDP/NCCL),
- host-side runtime (indexed dataset, slicer) available as C++ with Python
  fallback.

Public surface mirrors the reference: config chain loading, binarizer,
training task, ``Svc`` inference facade, vocoder registry.
"""

__version__ = "0.1.0"
