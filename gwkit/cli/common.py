"""Shared CLI plumbing."""
from __future__ import annotations

from argparse import ArgumentParser

from gwkit.utils.logging import configure_logging


def add_common_args(parser: ArgumentParser) -> None:
    parser.add_argument("--verbose", action="store_true", help="Print info logs.")
    parser.add_argument("--debug", action="store_true", help="Enable debug logs.")
    parser.add_argument("--force", action="store_true", help="Overwrite existing outputs.")
    parser.add_argument("--seed", type=int, default=42, help="Random seed.")
    parser.add_argument("--cpu", action="store_true", help="Force the CPU backend.")
    parser.add_argument("--debug-nans", action="store_true",
                        help="Raise on NaN in any jit output (the reference's "
                             "torch.autograd.set_detect_anomaly analogue).")


def setup(args) -> None:
    if getattr(args, "cpu", False):
        from gwkit.utils.platform import force_cpu

        force_cpu()
    if getattr(args, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)
    configure_logging(verbose=args.verbose, debug=args.debug)


def add_adapter_args(parser: ArgumentParser) -> None:
    parser.add_argument("--encoder", type=str, default="tiny",
                        choices=["tiny", "base", "small", "medium", "large"],
                        help="Whisper encoder size.")
    parser.add_argument("--method", type=str, default="DoRA", choices=["DoRA", "LoRA"],
                        help="Adapter variant (reference run_train.py --method).")
    parser.add_argument("--lora-rank", type=int, default=8, help="LoRA rank.")
    parser.add_argument("--lora-alpha", type=int, default=32, help="LoRA alpha.")
    parser.add_argument("--target-modules", type=str, default="qkvo",
                        help="Adapter targets: qkvo|qkv|kv|qv or comma list.")
    parser.add_argument("--hf-checkpoint", type=str, default=None,
                        help="Path to HF whisper weights (safetensors/torch) for the base encoder.")
    parser.add_argument("--pretrained-encoder", type=str, default=None,
                        help="gwkit encoder pytree (.npz), e.g. the InfoNCE-"
                             "pretrained encoder saved by scripts/ablation_dora.py.")


def add_mesh_arg(parser: ArgumentParser) -> None:
    parser.add_argument("--model-parallel", type=int, default=0,
                        help="Train over a ('data','model') mesh of ALL visible "
                             "devices with this tensor-parallel degree (0 = "
                             "single-device; 1 = pure data parallel).")


def build_mesh(args):
    """Mesh for Trainer(mesh=...) when --model-parallel is set, else None."""
    if not getattr(args, "model_parallel", 0):
        return None
    from gwkit.parallel.mesh import make_mesh

    return make_mesh(n_model=args.model_parallel)


def build_adapter_config(args):
    from gwkit.models.adapters import AdapterConfig

    return AdapterConfig(
        r=args.lora_rank, alpha=args.lora_alpha,
        use_dora=(args.method == "DoRA"), targets=args.target_modules,
    )


def build_encoder_config(args, n_frames=None):
    """TPU-tuned WhisperConfig for the training CLIs: bf16 compute, fused
    block/flash kernels, tanh GELU on TPU; remat everywhere (without it the
    f32 no-remat backward at T=1500 exceeds HBM — the scripts/ harnesses
    always configured this, the CLIs must too)."""
    import jax
    import jax.numpy as jnp

    from gwkit.models.whisper import config_for

    on_tpu = jax.devices()[0].platform != "cpu"
    kw = dict(
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_flash_attention=on_tpu, fused_block=on_tpu, remat=True,
        gelu_approx=on_tpu,
    )
    if n_frames:
        kw["max_positions"] = n_frames // 2
    return config_for(args.encoder, **kw)


def load_encoder_params(args, size: str):
    if args.hf_checkpoint:
        from gwkit.models.hf_io import load_hf_encoder

        _, params = load_hf_encoder(args.hf_checkpoint, size=size)
        return params
    if getattr(args, "pretrained_encoder", None):
        import jax

        from gwkit.models.whisper import config_for, init_encoder_params
        from gwkit.train.checkpoints import load_pytree

        template = init_encoder_params(jax.random.PRNGKey(0), config_for(size))
        params, _ = load_pytree(args.pretrained_encoder, template)
        return params
    return None
