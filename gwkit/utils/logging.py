"""Uniform logging configuration.

Matches the reference's format string and --verbose/--debug level selection
(MLGWSC-1/train.py:832-843, inference.py:42-49).
"""
from __future__ import annotations

import logging
import sys


def configure_logging(verbose: bool = False, debug: bool = False) -> None:
    level = logging.DEBUG if debug else (logging.INFO if verbose else logging.WARNING)
    logging.basicConfig(
        format="%(levelname)s | %(asctime)s: %(message)s",
        level=level,
        datefmt="%d-%m-%Y %H:%M:%S",
        handlers=[logging.StreamHandler(sys.stdout)],
    )
