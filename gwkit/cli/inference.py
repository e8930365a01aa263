"""MLGWSC-1 continuous-search CLI (reference: MLGWSC-1/inference.py):
apply a trained model over month-scale strain, write clustered triggers."""
from __future__ import annotations

import os
from argparse import ArgumentParser

from gwkit.cli.common import add_common_args, setup
from gwkit.utils.hdf5 import check_file_existence


def parse_args(argv=None):
    p = ArgumentParser(description="Apply a trained two-detector GW-Whisper model and save triggers.")
    add_common_args(p)
    p.add_argument("inputfile", type=str)
    p.add_argument("outputfile", type=str)
    p.add_argument("--white", action="store_true", help="Input is already whitened.")
    p.add_argument("--softmax", action="store_true", help="Use softmax scores (default USR logits).")
    p.add_argument("--lora-weights", type=str, required=True, help="peft-compatible LoRA dir.")
    p.add_argument("--dense-weights", type=str, required=True, help="Head checkpoint (.npz).")
    p.add_argument("--adapter-weights", type=str, required=True, help="Q-adapter checkpoint (.npz).")
    p.add_argument("--hf-checkpoint", type=str, default=None, help="Base encoder weights.")
    p.add_argument("--pretrained-encoder", type=str, default=None,
                   help="gwkit encoder pytree (.npz), e.g. the InfoNCE-pretrained "
                        "encoder — required to serve models trained with one.")
    p.add_argument("--target-shape", type=int, nargs=2, default=[80, 3000],
                   help="Q-adapter output geometry; (80, 512) is the production "
                        "serving geometry, (80, 3000) reference parity.")
    p.add_argument("--encoder", type=str, default="tiny")
    p.add_argument("-t", "--trigger-threshold", type=float, default=-0.5)
    p.add_argument("--step-size", type=float, default=0.1)
    p.add_argument("--cluster-threshold", type=float, default=0.35)
    p.add_argument("--batch-size", type=int, default=128,
                   help="scoring batch (128 measured fastest on TPU v5e; "
                        "the reference's 256 is a free parameter)")
    p.add_argument("--debug-triggers-file", type=str, default=None)
    p.add_argument("--debug-whitened-file", type=str, default=None)
    p.add_argument("--shard-dir", type=str, default=None,
                   help="Shared dir for the multi-host trigger gather "
                        "(jax.distributed runs; see gwkit.parallel.distributed).")
    p.add_argument("--int8", action="store_true",
                   help="int8 projections inside the fused encoder kernel "
                        "(TPU; ~2x MXU rate, validated within score parity "
                        "tolerances — see docs/PERF.md).")
    p.add_argument("--stream", type=int, choices=[0, 1], default=None,
                   help="Force segment streaming on/off (default: auto — C++ "
                        "prefetch when the file supports it).")
    p.add_argument("--qscan-stream", action="store_true",
                   help="Streaming Q-scan front end (window-overlap reuse): "
                        "each chunk of whitened strain is Q-transformed once "
                        "and windows crop their spectrograms from it. NOT "
                        "exact per-window-transform parity; validated on a "
                        "trained checkpoint (docs/results/stream_parity.md).")
    from gwkit.utils.config import parse_with_config

    return parse_with_config(p, argv)


def _load_gwkit_encoder(path: str, size: str, enc_cfg):
    """Load a gwkit encoder pytree (.npz — e.g. the InfoNCE-pretrained
    encoder) stored at either the default or the serving geometry, and
    re-pin the fixed sinusoidal position table to the serving geometry
    (``pos`` is deterministic, so geometry changes are exact)."""
    import jax
    import jax.numpy as jnp

    from gwkit.models.whisper import config_for, init_encoder_params, sinusoid_positions
    from gwkit.train.checkpoints import load_pytree

    import dataclasses

    import numpy as np

    # The ONLY geometry-dependent leaf is the sinusoidal ``pos`` table
    # (max_positions, d_model): a checkpoint trained at any serving length
    # (e.g. the production (80,512) -> 256 positions) must load at any other
    # (e.g. the strict (80,3000) -> 1500). Find the pos leaf's index in the
    # template structure, read its STORED length from the npz, and build the
    # template at that geometry; ``pos`` is re-pinned below, so the geometry
    # change is exact.
    template = init_encoder_params(jax.random.PRNGKey(0), enc_cfg)
    flat, _ = jax.tree.flatten(template)
    pos_idx = [i for i, leaf in enumerate(flat)
               if tuple(np.shape(leaf)) == (enc_cfg.max_positions, enc_cfg.d_model)]
    stored_cfgs = []
    if len(pos_idx) == 1:
        with np.load(path) as data:
            stored_len = int(data[f"leaf_{pos_idx[0]:05d}"].shape[0])
        stored_cfgs = [dataclasses.replace(enc_cfg, max_positions=stored_len)]
    params = None
    for template_cfg in stored_cfgs + [enc_cfg, config_for(size)]:
        template = init_encoder_params(jax.random.PRNGKey(0), template_cfg)
        try:
            params, _ = load_pytree(path, template)
            break
        except ValueError:
            continue
    if params is None:
        raise ValueError(
            f"{path}: stored encoder geometry matches neither its own pos-table "
            f"length, the serving config, nor the default ({size})")
    params = dict(params)
    params["pos"] = jnp.asarray(
        sinusoid_positions(enc_cfg.max_positions, enc_cfg.d_model))
    return params


def load_task_from_components(
    lora_weights: str,
    dense_weights: str,
    adapter_weights: str,
    encoder: str = "tiny",
    hf_checkpoint=None,
    usr: bool = True,
    seed: int = 42,
    pretrained_encoder=None,
    target_shape=(80, 3000),
    quant_int8: bool = False,
    compute_dtype=None,
):
    """build_model parity (inference.py:415-430): assemble the mlgwsc task
    from exported component checkpoints.

    ``pretrained_encoder`` loads a gwkit encoder pytree (the training CLIs'
    --pretrained-encoder counterpart — without it a model trained on an
    InfoNCE-pretrained encoder cannot be served). ``target_shape`` selects
    the Q-adapter geometry ((80, 512) is the production serving geometry;
    (80, 3000) the reference parity default). On TPU the encoder is built
    with the same bf16/fused-kernel tuning the training CLIs use;
    ``compute_dtype`` overrides (e.g. jnp.float32 for the bf16<->f32 parity
    gate, scripts/validate_bf16.py)."""
    import jax
    import jax.numpy as jnp

    from gwkit.models.adapters import import_peft_dir
    from gwkit.models.qadapter import QAdapterConfig
    from gwkit.models.whisper import config_for
    from gwkit.train.checkpoints import load_pytree
    from gwkit.train.tasks import build_mlgwsc

    n_frames = int(target_shape[1])
    on_tpu = jax.devices()[0].platform != "cpu"
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    enc_cfg = config_for(
        encoder, compute_dtype=compute_dtype,
        use_flash_attention=on_tpu, fused_block=on_tpu, gelu_approx=on_tpu,
        max_positions=n_frames // 2,
        # int8 projections need the fused block (TPU); a no-op elsewhere
        quant_int8=quant_int8 and on_tpu,
    )
    adapters, acfg = import_peft_dir(lora_weights, n_layers=enc_cfg.n_layers)
    encoder_params = None
    if hf_checkpoint:
        from gwkit.models.hf_io import load_hf_encoder
        from gwkit.models.whisper import sinusoid_positions

        _, encoder_params = load_hf_encoder(hf_checkpoint, size=encoder)
        encoder_params = dict(encoder_params)
        encoder_params["pos"] = jnp.asarray(  # HF tables are 1500-row
            sinusoid_positions(enc_cfg.max_positions, enc_cfg.d_model))
    elif pretrained_encoder:
        encoder_params = _load_gwkit_encoder(pretrained_encoder, encoder, enc_cfg)
    task = build_mlgwsc(
        jax.random.PRNGKey(seed), encoder=enc_cfg, acfg=acfg,
        encoder_params=encoder_params, usr=usr,
        qcfg=QAdapterConfig(target_shape=(int(target_shape[0]), n_frames)),
    )
    task.trainable["adapters"] = adapters
    task.trainable["head"], _ = load_pytree(dense_weights, task.trainable["head"])
    task.trainable["qadapter"], _ = load_pytree(adapter_weights, task.trainable["qadapter"])
    return task


def main(argv=None):
    import time

    args = parse_args(argv)
    setup(args)
    from gwkit.utils.config import dump_config

    dump_config(args, args.outputfile)
    for path in (args.outputfile, args.debug_whitened_file, args.debug_triggers_file):
        check_file_existence(path if path else None, args.force)
        if path and args.force and os.path.isfile(path):
            os.remove(path)

    from gwkit.search.engine import get_triggers, write_search_output

    t0 = time.time()
    task = load_task_from_components(
        args.lora_weights, args.dense_weights, args.adapter_weights,
        encoder=args.encoder, hf_checkpoint=args.hf_checkpoint, usr=not args.softmax,
        seed=args.seed, pretrained_encoder=args.pretrained_encoder,
        target_shape=tuple(args.target_shape), quant_int8=args.int8,
    )
    triggers, all_vals, result = get_triggers(
        task, args.inputfile,
        step_size=args.step_size, trigger_threshold=args.trigger_threshold,
        white=args.white, whitened_file=args.debug_whitened_file,
        batch_size=args.batch_size, verbose=args.verbose,
        stream=None if args.stream is None else bool(args.stream),
        shard_dir=args.shard_dir, qscan_stream=args.qscan_stream,
    )
    print(f"Total slices above threshold {args.trigger_threshold:.3f}: "
          f"{sum(len(v) for v in triggers.values())}")
    write_search_output(
        args.outputfile, triggers, all_vals,
        cluster_threshold=args.cluster_threshold,
        raw_triggers_path=args.debug_triggers_file,
    )
    print(f"Throughput: {result.throughput_x_realtime:.1f}x realtime "
          f"({result.n_windows} windows)")
    print(f"Total execution time: {time.time() - t0:.2f} seconds")


if __name__ == "__main__":
    main()
