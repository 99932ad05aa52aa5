"""Scheduler invariants (no external oracle available offline):

* exact-noise oracle: if the model returns the true eps that generated x_t
  from x0, every sampler must walk back to x0 (deterministic variants).
* inversion ∘ sampling ≈ identity for DDIM.
* monotonicity/shape sanity of schedules.
"""

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.schedulers import (
    make_noise_schedule, add_noise, pred_x0,
    ddim_init, ddim_step, ddim_inversion_step, ddpm_step,
    euler_ancestral_init, euler_ancestral_step,
    flow_init, flow_step,
)
from anyedit_tpu.schedulers.common import velocity_target, spaced_timesteps
from anyedit_tpu.schedulers.euler import euler_scale_input
from anyedit_tpu.schedulers.flow import flow_add_noise, flux_mu


def test_schedule_shapes():
    ns = make_noise_schedule()
    assert ns.betas.shape == (1000,)
    assert float(ns.alphas_cumprod[0]) > float(ns.alphas_cumprod[-1]) > 0
    ts = spaced_timesteps(1000, 50)
    # SD DDIMScheduler grid: steps_offset=1 → 981, 961, ..., 21, 1
    assert ts.shape == (50,) and int(ts[0]) == 981 and int(ts[-1]) == 1
    assert int(spaced_timesteps(1000, 50, steps_offset=0)[-1]) == 0


def test_pred_x0_consistency():
    ns = make_noise_schedule()
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (2, 4, 8, 8))
    noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = jnp.array([500, 123])
    xt = add_noise(ns, x0, noise, t)
    # epsilon parametrization
    x0_hat, eps_hat = jax.vmap(lambda m, s, tt: pred_x0(ns, m, s, tt))(noise, xt, t)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)
    # v parametrization
    nsv = ns._replace(prediction_type="v_prediction")
    v = jax.vmap(lambda a, b, tt: velocity_target(nsv, a, b, tt))(x0, noise, t)
    x0_hat2, eps_hat2 = jax.vmap(lambda m, s, tt: pred_x0(nsv, m, s, tt))(v, xt, t)
    np.testing.assert_allclose(np.asarray(x0_hat2), np.asarray(x0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(eps_hat2), np.asarray(noise), atol=1e-4)


def _exact_eps_model(ns, x0):
    """Oracle model: always returns the eps consistent with (x_t, x0)."""
    def model(x, t):
        acp = ns.alphas_cumprod[t]
        return (x - jnp.sqrt(acp) * x0) / jnp.sqrt(1.0 - acp)
    return model


def test_ddim_recovers_x0_with_oracle():
    ns = make_noise_schedule()
    st = ddim_init(ns, 20)
    key = jax.random.key(2)
    x0 = jax.random.normal(key, (1, 4, 8, 8))
    model = _exact_eps_model(ns, x0)
    eps0 = jax.random.normal(jax.random.fold_in(key, 7), x0.shape)
    x = add_noise(ns, x0, eps0, jnp.array(st.timesteps[0]))
    for i in range(20):
        x = ddim_step(ns, st, jnp.array(i), model(x, st.timesteps[i]), x)
    # SD convention (set_alpha_to_one=False): the walk ends at the
    # alphas_cumprod[0] noise level, retaining a sqrt(1-acp0) eps residual.
    # Deterministic DDIM with the oracle preserves the initial eps direction.
    acp0 = ns.alphas_cumprod[0]
    expect = jnp.sqrt(acp0) * x0 + jnp.sqrt(1.0 - acp0) * eps0
    np.testing.assert_allclose(np.asarray(x), np.asarray(expect), atol=1e-3)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=0.2)


def test_ddim_inversion_roundtrip():
    ns = make_noise_schedule()
    st = ddim_init(ns, 10)
    key = jax.random.key(3)
    x0 = 0.1 * jax.random.normal(key, (1, 4, 8, 8))
    eps0 = jax.random.normal(jax.random.fold_in(key, 11), x0.shape)
    model = _exact_eps_model(ns, x0)
    step = ns.num_train_steps // 10
    # start at the schedule's bottom level (acp[0], i.e. clamped t=0)
    x_bottom = add_noise(ns, x0, eps0, jnp.array(0))
    # invert upward (low→high noise): loop indices S-1 .. 0 reversed;
    # during inversion x sits at the *prev* level of index i
    x = x_bottom
    for i in reversed(range(10)):
        t_of_level = jnp.maximum(st.timesteps[i] - step, 0)
        x = ddim_inversion_step(ns, st, jnp.array(i), model(x, t_of_level), x)
    # sample back down
    for i in range(10):
        x = ddim_step(ns, st, jnp.array(i), model(x, st.timesteps[i]), x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_bottom), atol=1e-3)


def test_ddpm_oracle_converges():
    """ddpm_step is the stride-1 posterior q(x_{t-1}|x_t, x0): walk every
    t from 120 down to 0 with the oracle eps and require convergence."""
    ns = make_noise_schedule()
    key = jax.random.key(4)
    x0 = 0.5 * jax.random.normal(key, (1, 4, 8, 8))
    model = _exact_eps_model(ns, x0)
    t_start = 120
    x = add_noise(ns, x0, jax.random.normal(jax.random.fold_in(key, 1), x0.shape),
                  jnp.array(t_start))
    step = jax.jit(lambda t, m, x, k: ddpm_step(ns, t, m, x, k))
    for t in range(t_start, -1, -1):
        tt = jnp.array(t)
        x = step(tt, model(x, tt), x, jax.random.fold_in(key, 100 + t))
    assert float(jnp.mean(jnp.abs(x - x0))) < 0.05


def test_euler_ancestral_oracle():
    ns = make_noise_schedule()
    st = euler_ancestral_init(ns, 30)
    key = jax.random.key(5)
    x0 = 0.3 * jax.random.normal(key, (1, 4, 8, 8))

    def model(x_sigma_space, i):
        # oracle eps in sigma space: x = x0 + sigma*eps
        sigma = st.sigmas[i]
        return (x_sigma_space - x0) / jnp.clip(sigma, 1e-12)

    x = x0 + st.sigmas[0] * jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    for i in range(30):
        scaled = euler_scale_input(st, jnp.array(i), x)
        assert scaled.shape == x.shape
        x = euler_ancestral_step(ns, st, jnp.array(i), model(x, i), x,
                                 jax.random.fold_in(key, 200 + i))
    assert float(jnp.mean(jnp.abs(x - x0))) < 0.1


def test_flow_oracle_exact():
    st = flow_init(8, shift=3.0)
    key = jax.random.key(6)
    x0 = jax.random.normal(key, (1, 4, 8, 8))
    eps = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    x = flow_add_noise(st, jnp.array(0), x0, eps)
    v = eps - x0  # constant true velocity along the straight path
    for i in range(8):
        x = flow_step(st, jnp.array(i), v, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-5)
    assert 0.0 < flux_mu(1024) < 2.0


def test_full_loop_jits():
    ns = make_noise_schedule()
    st = ddim_init(ns, 10)

    @jax.jit
    def run(x):
        def body(i, x):
            eps = 0.1 * x  # stand-in model
            return ddim_step(ns, st, i, eps, x)
        return jax.lax.fori_loop(0, 10, body, x)

    out = run(jnp.ones((1, 4, 8, 8)))
    assert out.shape == (1, 4, 8, 8)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_dpm_solver_2m_oracle():
    """DPM-Solver++(2M) with the exact-eps oracle must converge to x0 much
    faster than DDIM (2nd-order): 10 steps, tight tolerance on the final
    state vs the schedule's bottom level."""
    from anyedit_tpu.schedulers.dpm import dpm_init, dpm_step, dpm_carry_init

    ns = make_noise_schedule()
    st = dpm_init(ns, 10)
    key = jax.random.key(7)
    x0 = 0.5 * jax.random.normal(key, (1, 4, 8, 8))
    model = _exact_eps_model(ns, x0)
    eps0 = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    x = add_noise(ns, x0, eps0, jnp.array(int(st.timesteps[0])))
    carry = dpm_carry_init(x.shape)
    for i in range(10):
        x, carry = dpm_step(ns, st, jnp.asarray(i), model(x, st.timesteps[i]),
                            x, carry)
    # ends at the clamped t=0 level: alpha/sigma of acp[0]
    acp0 = ns.alphas_cumprod[0]
    expect = jnp.sqrt(acp0) * x0 + jnp.sqrt(1 - acp0) * eps0
    np.testing.assert_allclose(np.asarray(x), np.asarray(expect), atol=5e-3)


def test_plms_oracle_and_history_orders():
    from anyedit_tpu.schedulers.dpm import dpm_init, plms_step, plms_carry_init

    ns = make_noise_schedule()
    st = dpm_init(ns, 20)
    key = jax.random.key(8)
    x0 = 0.4 * jax.random.normal(key, (1, 4, 8, 8))
    model = _exact_eps_model(ns, x0)
    eps0 = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    x = add_noise(ns, x0, eps0, jnp.array(int(st.timesteps[0])))
    carry = plms_carry_init(x.shape)
    for i in range(20):
        x, carry = plms_step(ns, st, jnp.asarray(i), model(x, st.timesteps[i]),
                             x, carry)
    assert int(carry.n_hist) == 20
    acp0 = ns.alphas_cumprod[0]
    expect = jnp.sqrt(acp0) * x0 + jnp.sqrt(1 - acp0) * eps0
    np.testing.assert_allclose(np.asarray(x), np.asarray(expect), atol=5e-3)


def test_dpm_plms_loops_jit():
    from anyedit_tpu.schedulers.dpm import (
        dpm_init, dpm_step, dpm_carry_init)

    ns = make_noise_schedule()
    st = dpm_init(ns, 8)

    @jax.jit
    def run(x):
        def body(i, carry):
            x, c = carry
            return dpm_step(ns, st, i, 0.1 * x, x, c)
        return jax.lax.fori_loop(0, 8, body, (x, dpm_carry_init(x.shape)))

    x, c = run(jnp.ones((1, 4, 8, 8)))
    assert bool(jnp.all(jnp.isfinite(x)))
