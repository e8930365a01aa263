"""gwkit.ops — device-resident DSP kernels (Layer 0 + front ends).

Everything here is a pure jittable function on jnp arrays, batched over a
leading batch axis, with static shapes, so front ends fuse into the model's
jit graph on TPU (the reference ran them per-sample on CPU DataLoader
workers — its dominant bottleneck, see SURVEY.md §2.2/§3.1).
"""
