"""Time the factored CIC deposit on the real chip at R=2 and R=4."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from py21cmfast_tpu.ops.deposit import factored_cic_deposit

print("devices:", jax.devices(), flush=True)


def bench(nl, R, support, cap):
    nh = nl * R
    key = jax.random.PRNGKey(0)
    hires = jax.random.normal(key, (nh, nh, nh), jnp.float32) * 0.1
    psi = tuple(
        jax.random.normal(jax.random.PRNGKey(i + 1), (nl, nl, nl), jnp.float32)
        for i in range(3)
    )
    d2c = (nl / (1.5 * nl),) * 3
    args = dict(ratio=R, support=support, cap=cap, lo_shape=(nl, nl, nl))
    out = factored_cic_deposit(
        hires, psi, None, jnp.float32(0.5), jnp.float32(1.5), jnp.float32(0.0),
        d2c, **args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        out = factored_cic_deposit(
            hires, psi, None, jnp.float32(0.5), jnp.float32(1.5),
            jnp.float32(0.0), d2c, **args)
        float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / n
    # HBM bound: read hires once per uz-offset (2S+2 passes) + acc traffic
    traffic = (2 * support + 2) * nh**3 * 4 + 10 * nl**3 * 4
    print(f"nl={nl} R={R} S={support} cap={cap}: {dt*1e3:.0f} ms "
          f"(~{traffic/dt/1e9:.0f} GB/s effective)", flush=True)


for nl, R in ((256, 2), (256, 4)):
    for S in (1, 2):
        bench(nl, R, S, 0)
