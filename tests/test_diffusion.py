"""Scheduler math tests against independently-computed closed forms."""

import jax
import jax.numpy as jnp
import numpy as np

from bdm_tpu import diffusion


def _np_tables(betas):
    betas = np.asarray(betas, dtype=np.float64)
    acp = np.cumprod(1.0 - betas)
    return betas, acp


def test_linear_betas_endpoints():
    betas = diffusion.linear_betas(1e-5, 8e-3, 1000)
    assert betas[0] == np.float32(1e-5) and betas[-1] == np.float32(8e-3)
    assert len(betas) == 1000


def test_custom_betas_warmup():
    betas = diffusion.custom_betas(1e-5, 8e-3, num_train_timesteps=1000)
    # first 300 steps are their own linspace reaching beta_end at step 299
    assert np.isclose(betas[299], 8e-3, atol=1e-6)
    assert np.isclose(betas[300], np.linspace(1e-5, 8e-3, 1000,
                                              dtype=np.float32)[300])


def test_pvd_betas_warm_schedules():
    betas = diffusion.pvd_betas("warm0.2", 1e-4, 2e-2, 1000)
    assert np.isclose(betas[199], 2e-2) and (betas[200:] == 2e-2).all()


def test_ddpm_add_noise_closed_form():
    sched = diffusion.DDPMScheduler(diffusion.linear_betas(1e-5, 8e-3, 100))
    _, acp = _np_tables(diffusion.linear_betas(1e-5, 8e-3, 100))
    x0 = jnp.ones((2, 4, 3))
    noise = jnp.full((2, 4, 3), 2.0)
    t = jnp.array([10, 50])
    got = np.asarray(sched.add_noise(x0, noise, t))
    for bi, ti in enumerate([10, 50]):
        want = np.sqrt(acp[ti]) * 1.0 + np.sqrt(1 - acp[ti]) * 2.0
        np.testing.assert_allclose(got[bi], want, rtol=1e-5)


def test_ddpm_step_mean_matches_posterior():
    betas = diffusion.linear_betas(1e-4, 2e-2, 100)
    sched = diffusion.DDPMScheduler(betas)
    sched.set_timesteps(100)
    betas64, acp = _np_tables(betas)

    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((1, 8, 3)).astype(np.float32)
    eps = rng.standard_normal((1, 8, 3)).astype(np.float32)
    t = 37
    x_t = np.sqrt(acp[t]) * x0 + np.sqrt(1 - acp[t]) * eps

    # With the exact eps, the x0 estimate is exact; check the DDPM mean.
    key = jax.random.PRNGKey(0)
    got = np.asarray(sched.step(jnp.asarray(eps), t, jnp.asarray(x_t), key))

    acp_prev = acp[t - 1]
    cur_beta = 1 - acp[t] / acp_prev
    coef_x0 = np.sqrt(acp_prev) * cur_beta / (1 - acp[t])
    coef_xt = np.sqrt(acp[t] / acp_prev) * (1 - acp_prev) / (1 - acp[t])
    mean = coef_x0 * x0 + coef_xt * x_t
    var = (1 - acp_prev) / (1 - acp[t]) * cur_beta
    noise = np.asarray(jax.random.normal(key, x_t.shape, jnp.float32))
    want = mean + np.sqrt(var) * noise
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ddpm_no_noise_at_t0():
    sched = diffusion.DDPMScheduler(diffusion.linear_betas(1e-4, 2e-2, 10))
    sched.set_timesteps(10)
    x_t = jnp.ones((1, 4, 3))
    eps = jnp.zeros((1, 4, 3))
    a = sched.step(eps, 0, x_t, jax.random.PRNGKey(0))
    b = sched.step(eps, 0, x_t, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_ddpm_timestep_spacing():
    sched = diffusion.DDPMScheduler(diffusion.linear_betas(1e-4, 2e-2, 1000))
    ts = sched.set_timesteps(1000)
    assert ts[0] == 999 and ts[-1] == 0 and len(ts) == 1000
    ts = sched.set_timesteps(50)
    assert ts[0] == 980 and ts[-1] == 0 and len(ts) == 50  # stride 20


def test_ddim_step_deterministic_identity():
    betas = diffusion.linear_betas(1e-4, 2e-2, 100)
    sched = diffusion.DDIMScheduler(betas)
    sched.set_timesteps(100)
    _, acp = _np_tables(betas)

    rng = np.random.default_rng(2)
    x0 = rng.standard_normal((1, 8, 3)).astype(np.float32)
    eps = rng.standard_normal((1, 8, 3)).astype(np.float32)
    t = 42
    x_t = np.sqrt(acp[t]) * x0 + np.sqrt(1 - acp[t]) * eps
    got = np.asarray(sched.step(jnp.asarray(eps), t, jnp.asarray(x_t)))
    want = np.sqrt(acp[t - 1]) * x0 + np.sqrt(1 - acp[t - 1]) * eps
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gaussian_diffusion_posterior_coefs():
    betas = diffusion.pvd_betas("linear", 1e-4, 2e-2, 100)
    gd = diffusion.GaussianDiffusion(betas)
    acp = np.cumprod(1 - betas)
    acp_prev = np.append(1.0, acp[:-1])
    c1 = betas * np.sqrt(acp_prev) / (1 - acp)
    c2 = (1 - acp_prev) * np.sqrt(1 - betas) / (1 - acp)
    np.testing.assert_allclose(np.asarray(gd.posterior_mean_coef1), c1,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gd.posterior_mean_coef2), c2,
                               rtol=1e-5)


def test_gaussian_p_sample_window_shapes_and_t0_determinism():
    betas = diffusion.pvd_betas("linear", 1e-4, 2e-2, 50)
    gd = diffusion.GaussianDiffusion(betas)
    denoise = lambda x, t: jnp.zeros_like(x)  # noqa: E731
    x = jnp.ones((2, 16, 3))
    out = gd.p_sample_window(denoise, x, start_time=10, final_time=5,
                             key=jax.random.PRNGKey(0))
    assert out.shape == x.shape
    # empty window is the identity
    same = gd.p_sample_window(denoise, x, 5, 5, key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(same), np.asarray(x))


def test_gaussian_q_sample_matches_ddpm_form():
    betas = diffusion.pvd_betas("linear", 1e-4, 2e-2, 100)
    gd = diffusion.GaussianDiffusion(betas)
    acp = np.cumprod(1 - betas)
    x0 = jnp.ones((2, 4, 3))
    noise = jnp.full((2, 4, 3), -1.0)
    t = jnp.array([3, 70])
    got = np.asarray(gd.q_sample(x0, t, noise))
    for bi, ti in enumerate([3, 70]):
        want = np.sqrt(acp[ti]) - np.sqrt(1 - acp[ti])
        np.testing.assert_allclose(got[bi], np.float32(want), rtol=1e-5)


def test_ddim_eta_nonzero_adds_noise():
    sched = diffusion.DDIMScheduler(diffusion.linear_betas(1e-4, 2e-2, 100))
    sched.set_timesteps(100)
    x_t = jnp.ones((1, 8, 3))
    eps = jnp.zeros((1, 8, 3))
    det = sched.step(eps, 50, x_t)
    a = sched.step(eps, 50, x_t, key=jax.random.PRNGKey(0), eta=1.0)
    b = sched.step(eps, 50, x_t, key=jax.random.PRNGKey(1), eta=1.0)
    # eta>0 is stochastic; eta=0 deterministic
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert np.allclose(np.asarray(det), np.asarray(sched.step(eps, 50, x_t)))


def test_gaussian_fixedlarge_variance():
    betas = diffusion.pvd_betas("linear", 1e-4, 2e-2, 50)
    gd = diffusion.GaussianDiffusion(betas, model_var_type="fixedlarge")
    want = np.log(np.concatenate([
        (betas * (1 - np.append(1.0, np.cumprod(1 - betas)[:-1]))
         / (1 - np.cumprod(1 - betas)))[1:2], betas[1:]]))
    np.testing.assert_allclose(np.asarray(gd.fixedlarge_log_variance), want,
                               rtol=1e-5)
    denoise = lambda x, t: jnp.zeros_like(x)  # noqa: E731
    out = gd.p_sample_window(denoise, jnp.ones((1, 8, 3)), 5, 0,
                             jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()
