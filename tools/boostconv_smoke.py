"""Quick CPU smoke of the rebuilt BoostConv on a small stable BFS."""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import time

import jax.numpy as jnp
import numpy as np

from nekstab_next_tpu.algorithms.fixed_point import boostconv_dns
from nekstab_next_tpu.cases.bfs import BackwardFacingStepCase

case = BackwardFacingStepCase(reynolds=500.0, order=4, elems_upstream=4,
                              elems_downstream=14, elems_y=4,
                              outflow_length=20.0)
ns = case.make_ns()
u0 = case.initial_flow()
st = jax.jit(lambda s: ns.advance(s, 800))(ns.make_state(u0))
jax.block_until_ready(st.u)
t0 = time.time()
last = [0.0]


def cb(steps, res):
    if time.time() - last[0] > 15:
        last[0] = time.time()
        print(f"step {steps} res {res:.3e} ({time.time()-t0:.0f}s)",
              flush=True)


r = boostconv_dns(ns, st.u, skip=25, subspace=12, tol=1e-10,
                  max_steps=60000, callback=cb)
print("converged:", r.converged, "res:", r.residual, "steps:", r.iterations,
      f"{time.time()-t0:.0f}s", flush=True)
