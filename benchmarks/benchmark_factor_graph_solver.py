"""Factor-graph linearization throughput (vmapped jacfwd)
(parity: reference benchmark_factor_graph_solver.py)."""
import numpy as np
from benchmarks._harness import run_benchmark

def main(factors: int = 2000):
    import jax, jax.numpy as jnp
    from mvslam_tpu.backend.factor_graph import MODELS, make_linearize_fn
    model = MODELS["se3"]
    lin = jax.jit(make_linearize_fn(model))
    rng = np.random.default_rng(0)
    n = factors + 1
    x = jnp.asarray(rng.normal(scale=0.1, size=(n, 6)), jnp.float32)
    edges = jnp.asarray(np.stack([np.arange(factors), np.arange(1, factors + 1)], 1), jnp.int32)
    meas = jnp.asarray(rng.normal(scale=0.1, size=(factors, 6)), jnp.float32)
    w = jnp.ones(factors, jnp.float32)
    jax.block_until_ready(lin(x, edges, meas, w))  # compile
    run_benchmark(
        "factor_graph_linearize",
        lambda: np.asarray(lin(x, edges, meas, w)[0]).sum(),
        items=factors, unit="factors/s",
    )

if __name__ == "__main__":
    main()
