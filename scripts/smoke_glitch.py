"""Smoke drive: glitch-classification CLI end-to-end on synthetic morphologies.

Generates an 11-class synthetic Gravity Spy-style corpus, trains via the
actual CLI entry point for 2 epochs (tiny encoder, short mel context), and
checks the classification-report artifact.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if os.environ.get("SMOKE_TPU", "0") != "1":
        from gwkit.utils.platform import force_cpu

        force_cpu()
    import h5py

    from gwkit.cli.train_glitch import main as train_main
    from gwkit.data.glitch import synthetic_glitch_dataset

    with tempfile.TemporaryDirectory() as d:
        corpus = os.path.join(d, "glitches.hdf")
        x, y = synthetic_glitch_dataset(8, seed=0, duration=0.25, sample_rate=1024.0)
        with h5py.File(corpus, "w") as f:
            f.create_dataset("strain", data=x)
            f.create_dataset("labels", data=y)
        out = os.path.join(d, "run")
        train_main([
            "-d", corpus, "-o", out, "--epochs", "2", "--batch-size", "16",
            "--encoder", "tiny", "--n-frames", "128", "--input-sample-rate", "1024",
            "--lora-rank", "2", "--lora-alpha", "4", "--target-modules", "kv",
            "--force", "--verbose",
        ])
        report = os.path.join(out, "classification_report.txt")
        assert os.path.isfile(report), "classification report missing"
        print(open(report).read().splitlines()[0])
        assert os.path.isfile(os.path.join(out, "losses.txt"))
    print("SMOKE GLITCH OK")


if __name__ == "__main__":
    main()
