"""gwkit.parallel — device mesh construction and sharding rules.

The reference is single-process single-GPU (SURVEY.md §2.9: DDP imports are
dead code); this layer is new. Scaling is pure SPMD: a named
``Mesh(("data", "model"))`` over ICI, params annotated with NamedShardings,
GSPMD inserting the collectives. Training is batch-sharded over "data" with
optional tensor parallelism of the encoder's attention/MLP over "model";
search inference shards the window axis over the whole mesh.
"""
