"""gwkit — a TPU-native (JAX/XLA/Pallas) gravitational-wave detection framework.

Re-implements, TPU-first, the capabilities of GW-Whisper
(github.com/chayanchatterjee/GW-Whisper): Whisper-encoder-based GW detection
with DoRA/LoRA parameter-efficient fine-tuning, covering three workloads:

* ``signal_vs_noise``  — H1/L1 binary classification on the speech log-mel front end
  (reference: ``Signal_vs_Noise/``)
* ``glitch``           — 11-class Gravity Spy glitch classification
  (reference: ``Glitch_classification/``)
* ``mlgwsc``           — MLGWSC-1 continuous search with a Q-transform front end
  (reference: ``MLGWSC-1/``)

Layer map (mirrors SURVEY.md §7):

* :mod:`gwkit.ops`        — device-resident DSP kernels (mel, Q-transform, whiten,
  resample, PSD, flash attention, fused DoRA matmul)
* :mod:`gwkit.models`     — Whisper encoder, adapters, task heads (pure-functional JAX)
* :mod:`gwkit.data`       — data generation (noise/waveforms/injections) + input pipeline
* :mod:`gwkit.train`      — jit training harness, losses, curriculum, checkpoints
* :mod:`gwkit.search`     — sliding-window continuous-search inference engine
* :mod:`gwkit.evaluation` — FAR / sensitive-distance / efficiency / ROC oracles (numpy)
* :mod:`gwkit.parallel`   — mesh construction and sharding rules (dp/tp over ICI)

Everything on the compute path is functional and jit-compatible: params are
pytrees, model application is a pure function, and front ends run *inside*
the jit graph on device (the reference ran them per-sample on CPU workers).
"""

__version__ = "0.1.0"
