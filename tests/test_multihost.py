"""Multi-host scale-out tests: 2-D (dcn, ici) hybrid mesh.

SURVEY.md §5 comm row owes "ICI within a slice and DCN across slices".
Two layers of coverage:
  * in-process: the 8 virtual CPU devices split into a (2, 4) hybrid mesh
    and every sharded step must agree with the single-device numerics
    when data shards over BOTH axes;
  * true multi-process: two OS processes (4 virtual chips each) form the
    global mesh via jax.distributed and run the production dynamics step
    (tests/_multihost_worker.py asserts gradient agreement inside).
"""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_mpc_tpu.models import LearnedDynamics, ResidualMLPDynamicsNet
from gan_mpc_tpu.parallel import (
    data_axes,
    make_hybrid_mesh,
    make_sharded_dynamics_step,
    shard_batch,
)
from gan_mpc_tpu.training.dynamics import multistep_prediction_loss
from gan_mpc_tpu.training.masking import masked_adam

KEY = jax.random.PRNGKey(0)
X_SIZE, U_SIZE, SEQ = 3, 1, 4


def _dyn_and_data(batch):
    dyn = LearnedDynamics(ResidualMLPDynamicsNet(x_size=X_SIZE, hidden=(16,)))
    params = {"dynamics_params": dyn.init(KEY, U_SIZE)}
    k1, k2, k3 = jax.random.split(KEY, 3)
    Xb = jax.random.normal(k1, (batch, SEQ, X_SIZE))
    Ub = jax.random.normal(k2, (batch, SEQ, U_SIZE))
    Yb = jax.random.normal(k3, (batch, SEQ, X_SIZE))
    return dyn, params, Xb, Ub, Yb


def test_hybrid_mesh_shape_and_axes():
    mesh = make_hybrid_mesh(dcn_size=2)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("dcn", "ici")
    assert data_axes(mesh) == ("dcn", "ici")


def test_sharded_dynamics_step_agrees_on_2d_mesh():
    """Gradient agreement: the same update computed (a) on one device
    over the full batch and (b) pmean-reduced over both mesh axes."""
    mesh = make_hybrid_mesh(dcn_size=2)
    axes = data_axes(mesh)
    dyn, params, Xb, Ub, Yb = _dyn_and_data(batch=16)
    opt, opt_state = masked_adam(params, [], 1e-3)

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

    step = make_sharded_dynamics_step(dyn, opt, mesh, gamma=0.9, axis=axes)
    p2, _, loss_sh = step(
        params,
        opt_state,
        *shard_batch((Xb, Ub, Yb), mesh, axis=axes),
        jnp.asarray(True),
    )
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), p2, params_ref
    )
    assert max(jax.tree.leaves(diffs)) < 1e-5


@pytest.mark.slow
def test_two_process_dcn_ici_mesh():
    """Two OS processes x 4 virtual chips = a real (2, 4) multi-host mesh
    through jax.distributed; the worker asserts gradient agreement."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), "4"],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(worker))),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK pid={pid}" in out, out[-3000:]
