"""gwkit.data — dataset generation and device-resident input pipeline (L1/L2).

The reference mixes injections per-sample on CPU inside Dataset.__getitem__
(MLGWSC-1/train.py:262-273) and runs Whisper feature extraction on DataLoader
workers. Here datasets live in device memory (HBM easily holds the reference's
corpus sizes) and batches are assembled on device: gather + SNR-scaled
injection mixing are part of the jit train step, with the SNR range passed as
a device scalar so curriculum updates never recompile.
"""
