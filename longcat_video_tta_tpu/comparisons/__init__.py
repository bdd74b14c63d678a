from .noise_opt import make_dno_step, noise_interp, optimize_noise, sample_from_noise  # noqa: F401
