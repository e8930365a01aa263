"""gwkit.train — jit training harness (Layer 4).

optax optimizers over adapter/head pytrees only (base encoder frozen by
construction), data-parallel jit steps over a device mesh, regularized
losses, curriculum SNR schedulers, early stopping, orbax checkpoints with
the reference's component-export surface.
"""
