#!/usr/bin/env python
"""Tiny TPU health probe (CLAUDE.md protocol): a small matmul with a
fetched checksum.  Run before committing the chip to a long job — the
tunneled worker has transient bad days on big-program compiles."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()
print(f"backend: {jax.default_backend()}, devices: {jax.devices()}", flush=True)
a = jnp.asarray(np.random.default_rng(0).normal(size=(512, 512)), jnp.float32)
b = (a @ a).sum()
print(f"probe checksum {float(b):.4e} in {time.time() - t0:.1f}s", flush=True)
sys.exit(0)
