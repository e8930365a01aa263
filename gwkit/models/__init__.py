"""gwkit.models — Whisper encoder backbone, adapters, and task heads.

Pure-functional: params are pytrees of jnp arrays, application is a pure
jittable function. Transformer layers are stacked along a leading axis and
applied with ``lax.scan`` (one compiled block regardless of depth), which
also gives every weight a uniform leading ``n_layers`` axis for sharding.
"""
