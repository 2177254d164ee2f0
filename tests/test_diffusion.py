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


# --------------------------------------------------------------------- PNDM

class _PNDMOracle:
    """Stateful NumPy transcription of diffusers==0.21.0 PNDMScheduler
    (scheduling_pndm.py), used as an independent oracle for the functional
    JAX implementation."""

    def __init__(self, betas, skip_prk_steps=False):
        betas = np.asarray(betas, np.float64)
        self.T = len(betas)
        self.acp = np.cumprod(1 - betas)
        self.final_acp = self.acp[0]          # set_alpha_to_one=False
        self.skip_prk_steps = skip_prk_steps
        self.pndm_order = 4

    def set_timesteps(self, n):
        self.n = n
        ratio = self.T // n
        base = (np.arange(0, n) * ratio).round().astype(np.int64)
        if self.skip_prk_steps:
            self.prk = np.array([], np.int64)
            self.plms = np.concatenate(
                [base[:-1], base[-2:-1], base[-1:]])[::-1]
        else:
            prk = np.array(base[-self.pndm_order:]).repeat(2) + np.tile(
                np.array([0, ratio // 2]), self.pndm_order)
            self.prk = (prk[:-1].repeat(2)[1:-1])[::-1].copy()
            self.plms = base[:-3][::-1].copy()
        self.ets, self.counter = [], 0
        self.cur_model_output = 0
        self.cur_sample = None
        return np.concatenate([self.prk, self.plms]).astype(np.int64)

    def _prev(self, sample, t, prev_t, out):
        acp_t = self.acp[min(t, self.T - 1)]
        acp_prev = self.acp[prev_t] if prev_t >= 0 else self.final_acp
        coeff = (acp_prev / acp_t) ** 0.5
        denom = (acp_t * (1 - acp_prev) ** 0.5
                 + (acp_t * (1 - acp_t) * acp_prev) ** 0.5)
        return coeff * sample - (acp_prev - acp_t) * out / denom

    def step(self, eps, t, x):
        if self.counter < len(self.prk) and not self.skip_prk_steps:
            return self._step_prk(eps, t, x)
        return self._step_plms(eps, t, x)

    def _step_prk(self, eps, t, x):
        ratio = self.T // self.n
        diff_to_prev = 0 if self.counter % 2 else ratio // 2
        prev_t = t - diff_to_prev
        t = self.prk[(self.counter // 4) * 4]
        if self.counter % 4 == 0:
            self.cur_model_output = self.cur_model_output + eps / 6
            self.ets.append(eps)
            self.cur_sample = x
        elif (self.counter - 1) % 4 == 0:
            self.cur_model_output = self.cur_model_output + eps / 3
        elif (self.counter - 2) % 4 == 0:
            self.cur_model_output = self.cur_model_output + eps / 3
        elif (self.counter - 3) % 4 == 0:
            eps = self.cur_model_output + eps / 6
            self.cur_model_output = 0
        sample = self.cur_sample if self.cur_sample is not None else x
        self.counter += 1
        return self._prev(sample, t, prev_t, eps)

    def _step_plms(self, eps, t, x):
        ratio = self.T // self.n
        prev_t = t - ratio
        if self.counter != 1:
            self.ets = self.ets[-3:]
            self.ets.append(eps)
        else:
            prev_t = t
            t = t + ratio
        if len(self.ets) == 1 and self.counter == 0:
            out = eps
            self.cur_sample = x
        elif len(self.ets) == 1 and self.counter == 1:
            out = (eps + self.ets[-1]) / 2
            x = self.cur_sample
            self.cur_sample = None
        elif len(self.ets) == 2:
            out = (3 * self.ets[-1] - self.ets[-2]) / 2
        elif len(self.ets) == 3:
            out = (23 * self.ets[-1] - 16 * self.ets[-2]
                   + 5 * self.ets[-3]) / 12
        else:
            out = (55 * self.ets[-1] - 59 * self.ets[-2]
                   + 37 * self.ets[-3] - 9 * self.ets[-4]) / 24
        self.counter += 1
        return self._prev(x, t, prev_t, out)


def _pndm_trajectory_check(skip_prk, n_infer, t_train=100):
    betas = diffusion.linear_betas(1e-4, 2e-2, t_train)
    sched = diffusion.PNDMScheduler(betas, skip_prk_steps=skip_prk)
    oracle = _PNDMOracle(betas, skip_prk_steps=skip_prk)
    ts = sched.set_timesteps(n_infer)
    ts_oracle = oracle.set_timesteps(n_infer)
    np.testing.assert_array_equal(ts, ts_oracle)

    rng = np.random.default_rng(0)
    shape = (2, 5, 3)
    x = rng.standard_normal(shape)
    xj = jnp.asarray(x, jnp.float32)
    state = sched.init_state(shape)
    # eps depends deterministically on the step so both sides agree without
    # sharing a model
    for i, t in enumerate(ts):
        eps = np.sin(0.1 * i + x * 0.0 + np.arange(3)) + 0.01 * i
        x = oracle.step(eps, int(t), x)
        xj, state = sched.step(jnp.asarray(eps, jnp.float32), int(t), xj,
                               state)
        np.testing.assert_allclose(np.asarray(xj), x, rtol=2e-4, atol=2e-4)


def test_pndm_matches_oracle_with_prk():
    _pndm_trajectory_check(skip_prk=False, n_infer=10)


def test_pndm_matches_oracle_with_prk_full_steps():
    _pndm_trajectory_check(skip_prk=False, n_infer=100)


def test_pndm_matches_oracle_skip_prk():
    _pndm_trajectory_check(skip_prk=True, n_infer=10)


def test_pndm_timesteps_structure():
    sched = diffusion.PNDMScheduler(diffusion.linear_betas(1e-4, 2e-2, 1000))
    ts = sched.set_timesteps(50)
    # 12 PRK warmup steps + (n-3) PLMS steps
    assert sched.prk_len == 12
    assert len(ts) == 12 + 50 - 3
    assert ts[-1] == 0 and ts.max() < 1000


def test_pndm_in_scheduler_factory():
    sched = diffusion.make_scheduler("pndm", 1e-5, 8e-3)
    assert isinstance(sched, diffusion.PNDMScheduler)
    x0 = jnp.ones((1, 4, 3))
    noise = jnp.zeros((1, 4, 3))
    out = sched.add_noise(x0, noise, jnp.array([10]))
    acp = np.cumprod(1 - np.asarray(diffusion.linear_betas(1e-5, 8e-3, 1000)))
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0],
                               np.float32(np.sqrt(acp[10])), rtol=1e-5)
