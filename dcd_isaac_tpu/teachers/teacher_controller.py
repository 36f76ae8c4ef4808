"""TeacherController: batches task sampling and episode-reward recording
(reference teachDeepRL/teachers/teacher_controller.py:43-116).

Only ALP-GMM is wired into the training runner (as in the reference,
adversarial_runner.py:152-173); the other teachers are selectable for
standalone use.
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional

import numpy as np

from .alp_gmm import ALPGMM, CovarGMM, OracleTeacher, RIAC, RandomTeacher


def expand_bounds(param_env_bounds: Dict) -> (list, list):
    mins, maxs = [], []
    for name, bounds in param_env_bounds.items():
        if len(bounds) == 2:
            mins.append(bounds[0])
            maxs.append(bounds[1])
        elif len(bounds) == 3:  # [min, max, nb_dims]
            mins.extend([bounds[0]] * bounds[2])
            maxs.extend([bounds[1]] * bounds[2])
        else:
            raise ValueError('bounds must be [min,max] or [min,max,n]')
    return mins, maxs


class TeacherController:
    def __init__(self, teacher: str, nb_test_episodes: int,
                 param_env_bounds: Dict, reward_bounds=None,
                 seed: Optional[int] = None, teacher_params=None):
        teacher_params = teacher_params or {}
        self.teacher = teacher
        self.reward_bounds = reward_bounds
        self.param_env_bounds = copy.deepcopy(param_env_bounds)
        mins, maxs = expand_bounds(param_env_bounds)

        cls = {
            'Oracle': OracleTeacher,
            'Random': RandomTeacher,
            'RIAC': RIAC,
            'ALP-GMM': ALPGMM,
            'Covar-GMM': CovarGMM,
        }[teacher]
        if teacher == 'Oracle':
            self.task_generator = cls(
                mins, maxs, teacher_params['window_step_vector'], seed=seed)
        else:
            self.task_generator = cls(
                mins, maxs, seed=seed, params=teacher_params)

        self.env_params_train: List[np.ndarray] = []
        self.env_train_rewards: List[float] = []

    def sample_batch(self, n: int) -> np.ndarray:
        """n task vectors; remembers them for reward attribution."""
        batch = np.stack([self.task_generator.sample_task()
                          for _ in range(n)])
        self.env_params_train = list(batch)
        return batch

    def record_train_episode(self, reward: float, index: int = 0):
        self.env_train_rewards.append(reward)
        if self.teacher != 'Oracle' and self.reward_bounds:
            reward = float(np.interp(reward, self.reward_bounds, (0, 1)))
        self.task_generator.update(self.env_params_train[index], reward)
