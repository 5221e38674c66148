"""Worker process for the multi-host (2-process) mesh test.

Run as: python tests/_multihost_worker.py <process_id> <num_processes>
<port> <local_devices>

Each process owns <local_devices> virtual CPU chips; together they form a
(num_processes, local_devices) hybrid ("dcn", "ici") mesh. The worker
runs one data-parallel dynamics update through the production
``make_sharded_dynamics_step`` on a globally-sharded batch and asserts
the result matches a locally-computed single-device update on the full
batch (gradient agreement across the 2-D mesh). Prints MULTIHOST_OK on
success — the pytest parent checks for it.
"""

import os
import sys

# conftest recipe: this image pre-imports jax via sitecustomize, so the
# platform must be forced through jax.config; XLA_FLAGS is read at
# backend init, which has not happened yet in a fresh process.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    n_local = sys.argv[4] if len(sys.argv) > 4 else "4"
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_local}"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = int(sys.argv[3])
    n_local = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    kw = {}
    if pid == 0:
        # the default coordinator bind address (IPv6 any) is unavailable
        # in sandboxed environments; bind the loopback explicitly.
        kw["coordinator_bind_address"] = f"127.0.0.1:{port}"
    jax.distributed.initialize(
        f"127.0.0.1:{port}", num_processes=nproc, process_id=pid, **kw
    )
    assert len(jax.devices()) == nproc * n_local

    sys.path.insert(0, os.getcwd())
    from gan_mpc_tpu.models import LearnedDynamics, ResidualMLPDynamicsNet
    from gan_mpc_tpu.parallel import (
        data_axes,
        make_hybrid_mesh,
        make_sharded_dynamics_step,
    )
    from gan_mpc_tpu.training.dynamics import multistep_prediction_loss
    from gan_mpc_tpu.training.masking import masked_adam

    mesh = make_hybrid_mesh()
    assert mesh.devices.shape == (nproc, n_local), mesh.devices.shape
    axes = data_axes(mesh)
    assert axes == ("dcn", "ici")

    X_SIZE, U_SIZE, SEQ = 3, 1, 4
    key = jax.random.PRNGKey(0)
    dyn = LearnedDynamics(ResidualMLPDynamicsNet(x_size=X_SIZE, hidden=(16,)))
    params = {"dynamics_params": dyn.init(key, U_SIZE)}
    opt, opt_state = masked_adam(params, [], 1e-3)

    batch = 4 * nproc * n_local
    k1, k2, k3 = jax.random.split(key, 3)
    Xb = np.asarray(jax.random.normal(k1, (batch, SEQ, X_SIZE)))
    Ub = np.asarray(jax.random.normal(k2, (batch, SEQ, U_SIZE)))
    Yb = np.asarray(jax.random.normal(k3, (batch, SEQ, X_SIZE)))

    # --- single-device reference on the FULL batch (local device 0) ---
    def full_loss(p):
        losses = jax.vmap(
            lambda x, u, y: multistep_prediction_loss(
                dyn, p["dynamics_params"], x, u, y, 0.9, jnp.asarray(True)
            )
        )(Xb, Ub, Yb)
        return jnp.mean(losses)

    loss_ref, grads_ref = jax.value_and_grad(full_loss)(params)
    import optax

    updates_ref, _ = opt.update(grads_ref, opt_state, params)
    params_ref = optax.apply_updates(params, updates_ref)

    # --- the production sharded step over the 2-D global mesh ---
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axes))
    per_proc = batch // nproc

    def to_global(arr, sharding):
        local = (
            arr
            if sharding is rep
            else arr[pid * per_proc : (pid + 1) * per_proc]
        )
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(local)
        )

    g_params = jax.tree.map(lambda a: to_global(np.asarray(a), rep), params)
    g_ostate = jax.tree.map(
        lambda a: to_global(np.asarray(a), rep), opt_state
    )
    gX, gU, gY = (to_global(a, shard) for a in (Xb, Ub, Yb))

    step = make_sharded_dynamics_step(dyn, opt, mesh, gamma=0.9, axis=axes)
    p2, _, loss_sh = step(
        g_params, g_ostate, gX, gU, gY, to_global(np.asarray(True), rep)
    )

    np.testing.assert_allclose(
        float(jax.device_get(loss_sh)), float(loss_ref), rtol=1e-5
    )
    diffs = jax.tree.map(
        lambda a, b: float(
            np.abs(np.asarray(jax.device_get(a)) - np.asarray(b)).max()
        ),
        p2,
        params_ref,
    )
    maxdiff = max(jax.tree.leaves(diffs))
    assert maxdiff < 1e-5, f"params diverge across mesh: {maxdiff}"
    print(f"MULTIHOST_OK pid={pid} maxdiff={maxdiff:.2e}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
