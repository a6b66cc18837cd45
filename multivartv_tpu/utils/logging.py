"""Observability: structured solve logging.

The reference prints lambda and iteration counts under a verbose flag
(Rcpp::Rcout, solvers.cpp:134,194,271,312).  Here: a standard-library
logger plus an in-jit per-lambda progress hook via jax.debug.print (safe
inside scan; host-synced, so opt-in).
"""

from __future__ import annotations

import logging
import sys

import jax

LOGGER_NAME = "multivartv_tpu"


def get_logger() -> logging.Logger:
    logger = logging.getLogger(LOGGER_NAME)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


def jit_progress(lam, iters):
    """Per-lambda progress line from inside a jitted scan (reference
    admm_update verbose print, solvers.cpp:134)."""
    jax.debug.print("Lambda= {lam}, Counter = {it}", lam=lam, it=iters)
