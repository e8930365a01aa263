"""Real-events CLI (reference: Signal_vs_Noise/Real_events/
evaluation_real_events.py): score GWTC catalog event strain with the
two-channel classifier and write per-event score series."""
from __future__ import annotations

from argparse import ArgumentParser

from gwkit.cli.common import add_adapter_args, add_common_args, build_adapter_config, load_encoder_params, setup


def parse_args(argv=None):
    p = ArgumentParser(description="Score real-event strain segments with the two-channel model.")
    add_common_args(p)
    add_adapter_args(p)
    p.add_argument("-d", "--events-file", type=str, required=True,
                   help="HDF5 with one (2, N) whitened-strain dataset per event.")
    p.add_argument("--checkpoint", type=str, required=True, help="Trainable checkpoint (.npz).")
    p.add_argument("-o", "--output", type=str, required=True,
                   help="Output HDF5 of per-event sigmoid score series.")
    p.add_argument("--window", type=int, default=2048)
    p.add_argument("--step", type=int, default=204)
    p.add_argument("--sample-rate", type=float, default=2048.0)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--n-frames", type=int, default=3000)
    p.add_argument("--whiten", action="store_true", help="Whiten the event strain first.")
    from gwkit.utils.config import parse_with_config

    return parse_with_config(p, argv)


def main(argv=None):
    args = parse_args(argv)
    setup(args)
    from gwkit.utils.config import dump_config

    dump_config(args, args.output)
    import h5py
    import jax

    from gwkit.search.realevents import score_event_segments, write_event_scores
    from gwkit.train.checkpoints import load_pytree
    from gwkit.train.tasks import build_signal_vs_noise

    with h5py.File(args.events_file, "r") as f:
        events = {name: f[name][()] for name in f.keys()}

    task = build_signal_vs_noise(
        jax.random.PRNGKey(args.seed), encoder=args.encoder,
        acfg=build_adapter_config(args),
        encoder_params=load_encoder_params(args, args.encoder),
        input_sample_rate=int(args.sample_rate), n_frames=args.n_frames,
    )
    trainable, _ = load_pytree(args.checkpoint, task.trainable)
    scores = score_event_segments(
        task, events, sample_rate=args.sample_rate, window=args.window,
        step=args.step, batch_size=args.batch_size, trainable=trainable,
        white=not args.whiten,
    )
    write_event_scores(args.output, scores)
    for name, vals in scores.items():
        print(f"{name}: {len(vals)} windows, max score {vals.max() if len(vals) else float('nan'):.4f}")


if __name__ == "__main__":
    main()
