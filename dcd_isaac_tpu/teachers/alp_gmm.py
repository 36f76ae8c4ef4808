"""ALP-GMM and baseline curriculum teachers (host-side).

Reference teachDeepRL/teachers/: ALPGMM (alp_gmm.py:24-178), CovarGMM,
RIAC, RandomTeacher, OracleTeacher.  These run once per episode batch
(sklearn GMM re-fit every ``fit_rate`` episodes), so they stay host-side
numpy/sklearn — the sampled task vectors are fed into the jitted cycle as
array arguments (SURVEY.md §7.7).

The kd-tree knn buffer (BufferedDataset) is replaced by brute-force nearest
neighbour over the bounded history (≤500 entries) — identical results, no
external dependency.
"""

from __future__ import annotations

import numpy as np
from sklearn.mixture import GaussianMixture as GMM


def _proportional_choice(v, rng, eps=0.0):
    v = np.asarray(v, np.float64)
    if np.sum(v) == 0 or rng.rand() < eps:
        return rng.randint(np.size(v))
    probas = v / np.sum(v)
    return int(np.where(rng.multinomial(1, probas) == 1)[0][0])


class _ALPComputer:
    """Empirical absolute-learning-progress via nearest previous task
    (alp_gmm.py:24-45)."""

    def __init__(self, task_size, buffer_size=500, max_size=None):
        self.buffer_size = buffer_size
        self.max_size = max_size
        self.tasks = []
        self.rewards = []

    def compute_alp(self, task, reward):
        alp = 0.0
        if len(self.tasks) > 5:
            arr = np.asarray(self.tasks)
            d = ((arr - task) ** 2).sum(-1)
            idx = int(np.argmin(d))
            alp = abs(reward - self.rewards[idx])
        self.tasks.append(np.asarray(task, np.float64))
        self.rewards.append(float(reward))
        if self.max_size and len(self.tasks) > self.max_size:
            self.tasks.pop(0)
            self.rewards.pop(0)
        return alp


class RandomTeacher:
    def __init__(self, mins, maxs, seed=None, params=None):
        self.mins = np.asarray(mins, np.float32)
        self.maxs = np.asarray(maxs, np.float32)
        self.rng = np.random.RandomState(seed)

    def update(self, task, reward):
        pass

    def sample_task(self):
        return self.rng.uniform(self.mins, self.maxs).astype(np.float32)


class OracleTeacher(RandomTeacher):
    """Sliding window along a hand-designed direction
    (teachDeepRL oracle_teacher.py)."""

    def __init__(self, mins, maxs, window_step_vector, seed=None,
                 step_rate=50, **kw):
        super().__init__(mins, maxs, seed)
        self.window_step_vector = np.asarray(window_step_vector)
        self.step_rate = step_rate
        self.window_range = (self.maxs - self.mins) / 6
        self.window_pos = self.mins.copy().astype(np.float64)
        self.counter = 0

    def update(self, task, reward):
        self.counter += 1
        if self.counter % self.step_rate == 0:
            self.window_pos = np.clip(
                self.window_pos + self.window_step_vector,
                self.mins, self.maxs - self.window_range)

    def sample_task(self):
        return (self.window_pos + self.rng.uniform(0, 1, len(self.mins))
                * self.window_range).astype(np.float32)


class ALPGMM:
    """alp_gmm.py:49-178 — GMM over (task, ALP) with AIC/BIC selection."""

    def __init__(self, mins, maxs, seed=None, params=None):
        params = params or {}
        self.seed = seed or np.random.randint(42, 424242)
        self.rng = np.random.RandomState(self.seed)
        self.mins = np.asarray(mins, np.float64)
        self.maxs = np.asarray(maxs, np.float64)
        self.potential_ks = params.get('potential_ks', np.arange(2, 11, 1))
        self.warm_start = params.get('warm_start', False)
        self.gmm_fitness_fun = params.get('gmm_fitness_fun', 'aic')
        self.nb_em_init = params.get('nb_em_init', 1)
        self.fit_rate = params.get('fit_rate', 250)
        self.nb_random = self.fit_rate
        self.random_task_ratio = params.get('random_task_ratio', 0.2)
        self.alp_computer = _ALPComputer(
            len(mins),
            buffer_size=params.get('alp_buffer_size', 500),
            max_size=params.get('alp_max_size'))
        self.tasks = []
        self.alps = []
        self.tasks_alps = []
        self.gmm = None

    def _new_gmm(self, k):
        return GMM(n_components=k, covariance_type='full',
                   random_state=self.seed, warm_start=self.warm_start,
                   n_init=self.nb_em_init)

    def update(self, task, reward):
        task = np.asarray(task, np.float64)
        self.tasks.append(task)
        self.alps.append(self.alp_computer.compute_alp(task, reward))
        self.tasks_alps.append(np.concatenate([task, [self.alps[-1]]]))

        if (len(self.tasks) >= self.nb_random
                and len(self.tasks) % self.fit_rate == 0):
            data = np.asarray(self.tasks_alps[-self.fit_rate:])
            fitted, fitness = [], []
            for k in self.potential_ks:
                try:
                    g = self._new_gmm(int(k)).fit(data)
                    fitted.append(g)
                    fitness.append(
                        g.bic(data) if self.gmm_fitness_fun == 'bic'
                        else g.aic(data))
                except (FloatingPointError, ValueError):
                    continue
            self.gmm = fitted[int(np.argmin(fitness))] if fitted else None

    def sample_task(self):
        if (len(self.tasks) < self.nb_random
                or self.rng.rand() < self.random_task_ratio
                or self.gmm is None):
            return self.rng.uniform(self.mins, self.maxs).astype(np.float32)
        alp_means = [m[-1] for m in self.gmm.means_]
        idx = _proportional_choice(alp_means, self.rng)
        task = self.rng.multivariate_normal(
            self.gmm.means_[idx], self.gmm.covariances_[idx])[:-1]
        return np.clip(task, self.mins, self.maxs).astype(np.float32)


class CovarGMM(ALPGMM):
    """Covar-GMM (Moulin-Frier et al.): sample ∝ positive reward-time
    covariance per Gaussian (teachDeepRL covar_gmm.py)."""

    def __init__(self, mins, maxs, seed=None, params=None):
        super().__init__(mins, maxs, seed, params)
        self.t = 0

    def update(self, task, reward):
        self.t += 1
        task = np.asarray(task, np.float64)
        self.tasks.append(task)
        self.alps.append(float(reward))
        self.tasks_alps.append(
            np.concatenate([task, [self.t / 1000.0], [reward]]))
        if (len(self.tasks) >= self.nb_random
                and len(self.tasks) % self.fit_rate == 0):
            data = np.asarray(self.tasks_alps[-self.fit_rate:])
            fitted, fitness = [], []
            for k in self.potential_ks:
                try:
                    g = self._new_gmm(int(k)).fit(data)
                    fitted.append(g)
                    fitness.append(g.aic(data))
                except (FloatingPointError, ValueError):
                    continue
            self.gmm = fitted[int(np.argmin(fitness))] if fitted else None

    def sample_task(self):
        if (len(self.tasks) < self.nb_random
                or self.rng.rand() < self.random_task_ratio
                or self.gmm is None):
            return self.rng.uniform(self.mins, self.maxs).astype(np.float32)
        # time-reward covariance, clipped positive, per Gaussian
        covars = [
            max(0.0, c[-1, -2]) for c in self.gmm.covariances_]
        idx = _proportional_choice(covars, self.rng)
        task = self.rng.multivariate_normal(
            self.gmm.means_[idx], self.gmm.covariances_[idx])[:-2]
        return np.clip(task, self.mins, self.maxs).astype(np.float32)


class RIAC:
    """Robust Intelligent Adaptive Curiosity: recursive region splitting by
    ALP (teachDeepRL riac.py, compact re-implementation)."""

    def __init__(self, mins, maxs, seed=None, params=None):
        params = params or {}
        self.rng = np.random.RandomState(seed)
        self.mins = np.asarray(mins, np.float64)
        self.maxs = np.asarray(maxs, np.float64)
        self.max_region_size = params.get('max_region_size', 200)
        self.alp_window = params.get('alp_window_size', 100)
        self.nb_dims = len(mins)
        # regions: list of (low, high, tasks, rewards)
        self.regions = [
            (self.mins.copy(), self.maxs.copy(), [], [])]
        self.random_task_ratio = 0.2

    def _region_alp(self, region):
        _, _, tasks, rewards = region
        if len(rewards) < 10:
            return 0.0
        w = rewards[-self.alp_window:]
        half = len(w) // 2
        return abs(np.mean(w[half:]) - np.mean(w[:half]))

    def update(self, task, reward):
        task = np.asarray(task)
        for i, (lo, hi, tasks, rewards) in enumerate(self.regions):
            if np.all(task >= lo) and np.all(task <= hi):
                tasks.append(task)
                rewards.append(float(reward))
                if len(tasks) > self.max_region_size:
                    self._split(i)
                break

    def _split(self, i):
        lo, hi, tasks, rewards = self.regions.pop(i)
        dim = int(self.rng.randint(self.nb_dims))
        mid = (lo[dim] + hi[dim]) / 2
        lo2 = lo.copy(); lo2[dim] = mid
        hi1 = hi.copy(); hi1[dim] = mid
        t = np.asarray(tasks)
        mask = t[:, dim] <= mid
        self.regions.append(
            (lo, hi1, [x for x, m in zip(tasks, mask) if m],
             [r for r, m in zip(rewards, mask) if m]))
        self.regions.append(
            (lo2, hi, [x for x, m in zip(tasks, mask) if not m],
             [r for r, m in zip(rewards, mask) if not m]))

    def sample_task(self):
        if self.rng.rand() < self.random_task_ratio:
            return self.rng.uniform(self.mins, self.maxs).astype(np.float32)
        alps = [self._region_alp(r) for r in self.regions]
        idx = _proportional_choice(alps, self.rng)
        lo, hi, _, _ = self.regions[idx]
        return self.rng.uniform(lo, hi).astype(np.float32)
