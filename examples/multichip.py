"""Multi-device chain-parallel sampling with cross-chain adaptation.

Runs on any device set — a TPU pod slice, or a virtual CPU mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/multichip.py
On a multi-host pod call ahmc.parallel.mesh.distributed_init() first.
"""

import jax
import jax.numpy as jnp

import advancedhmc_tpu as ahmc
from advancedhmc_tpu.parallel.mesh import mesh_of_all_devices

def main():
    mesh = mesh_of_all_devices()
    print(f"devices: {len(jax.devices())}, mesh: {mesh}")

    target = ahmc.as_target(lambda th: -0.5 * jnp.sum(th**2), dim=16)
    res = ahmc.NUTS(0.8).sample(
        jax.random.PRNGKey(0), target, jnp.zeros(16),
        n_samples=600, n_adapts=300, n_chains=len(jax.devices()) * 64,
        cross_chain=True,           # Welford/DA psum-reduced over the mesh
        mesh=mesh, fuse_draws=25, verbose=True,
    )
    print("draw sharding:", res.thetas.sharding)

if __name__ == "__main__":
    main()
