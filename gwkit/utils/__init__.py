from gwkit.utils.prng import key_seq  # noqa: F401
