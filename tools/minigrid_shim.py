"""Minimal `gym` + `gym_minigrid` shims for executing the REFERENCE
MultiGrid code (/root/reference/envs/multigrid) in this image.

Neither old `gym` nor `gym_minigrid` is installed; the reference imports
both.  These shims re-create the SUBSET of the public gym_minigrid.minigrid
API the reference actually uses (constants, WorldObj family, Grid container
with encode/process_vis, MiniGridEnv base with old-gym RandomState seeding)
so the reference's OWN logic — placement, stepping, rewards, occlusion calls
— runs unmodified and can be recorded as golden traces.

Semantics follow gym_minigrid 1.x (maximecb/gym-minigrid), which is the
version the reference pins (requirements.txt).
"""

import sys
import types
from enum import IntEnum

import numpy as np

# np.bool / np.float were removed in numpy 2; the reference uses them.
if not hasattr(np, 'bool'):
    np.bool = bool
if not hasattr(np, 'float'):
    np.float = float
if not hasattr(np, 'int'):
    np.int = int


# ---------------------------------------------------------------------------
# gym shim (spaces from gymnasium; old-gym RandomState seeding)
# ---------------------------------------------------------------------------

def install_gym_shim():
    if 'gym' in sys.modules:
        return sys.modules['gym']
    import gymnasium

    gym = types.ModuleType('gym')
    gym.spaces = gymnasium.spaces
    gym.Env = gymnasium.Env

    error = types.ModuleType('gym.error')

    class Error(Exception):
        pass

    for name in ('RetriesExceededError', 'DeprecatedEnv', 'UnregisteredEnv',
                 'UnsupportedMode', 'AlreadyPendingCallError'):
        setattr(error, name, type(name, (Error,), {}))
    error.Error = Error

    logger = types.ModuleType('gym.logger')
    logger.info = logger.warn = logger.error = lambda *a, **k: None

    utils = types.ModuleType('gym.utils')
    seeding = types.ModuleType('gym.utils.seeding')

    def np_random(seed=None):
        return np.random.RandomState(seed), seed

    seeding.np_random = np_random
    utils.seeding = seeding
    utils.colorize = lambda s, *a, **k: s

    gym.error = error
    gym.logger = logger
    gym.utils = utils
    sys.modules['gym'] = gym
    sys.modules['gym.error'] = error
    sys.modules['gym.logger'] = logger
    sys.modules['gym.utils'] = utils
    sys.modules['gym.utils.seeding'] = seeding
    return gym


# ---------------------------------------------------------------------------
# gym_minigrid.minigrid shim
# ---------------------------------------------------------------------------

TILE_PIXELS = 32

COLORS = {
    'red': np.array([255, 0, 0]),
    'green': np.array([0, 255, 0]),
    'blue': np.array([0, 0, 255]),
    'purple': np.array([112, 39, 195]),
    'yellow': np.array([255, 255, 0]),
    'grey': np.array([100, 100, 100]),
}
COLOR_TO_IDX = {'red': 0, 'green': 1, 'blue': 2, 'purple': 3,
                'yellow': 4, 'grey': 5}
IDX_TO_COLOR = {v: k for k, v in COLOR_TO_IDX.items()}

OBJECT_TO_IDX = {
    'unseen': 0, 'empty': 1, 'wall': 2, 'floor': 3, 'door': 4, 'key': 5,
    'ball': 6, 'box': 7, 'goal': 8, 'lava': 9, 'agent': 10,
}
IDX_TO_OBJECT = {v: k for k, v in OBJECT_TO_IDX.items()}

DIR_TO_VEC = [
    np.array((1, 0)), np.array((0, 1)),
    np.array((-1, 0)), np.array((0, -1)),
]


class WorldObj:
    def __init__(self, type, color):
        assert type in OBJECT_TO_IDX, type
        assert color in COLOR_TO_IDX, color
        self.type = type
        self.color = color
        self.contains = None
        self.init_pos = None
        self.cur_pos = None

    def can_overlap(self):
        return False

    def can_pickup(self):
        return False

    def can_contain(self):
        return False

    def see_behind(self):
        return True

    def toggle(self, env, pos):
        return False

    def encode(self):
        return (OBJECT_TO_IDX[self.type], COLOR_TO_IDX[self.color], 0)

    def render(self, img):
        raise NotImplementedError('rendering not available in shim')


class Goal(WorldObj):
    def __init__(self):
        super().__init__('goal', 'green')

    def can_overlap(self):
        return True


class Floor(WorldObj):
    def __init__(self, color='blue'):
        super().__init__('floor', color)

    def can_overlap(self):
        return True


class Lava(WorldObj):
    def __init__(self):
        super().__init__('lava', 'red')

    def can_overlap(self):
        return True


class Wall(WorldObj):
    def __init__(self, color='grey'):
        super().__init__('wall', color)

    def see_behind(self):
        return False


class Door(WorldObj):
    def __init__(self, color, is_open=False, is_locked=False):
        super().__init__('door', color)
        self.is_open = is_open
        self.is_locked = is_locked

    def can_overlap(self):
        return self.is_open

    def see_behind(self):
        return self.is_open

    def toggle(self, env, pos):
        if self.is_locked:
            if isinstance(env.carrying, Key) \
                    and env.carrying.color == self.color:
                self.is_locked = False
                self.is_open = True
                return True
            return False
        self.is_open = not self.is_open
        return True

    def encode(self):
        if self.is_open:
            state = 0
        elif self.is_locked:
            state = 2
        else:
            state = 1
        return (OBJECT_TO_IDX[self.type], COLOR_TO_IDX[self.color], state)


class Key(WorldObj):
    def __init__(self, color='blue'):
        super().__init__('key', color)

    def can_pickup(self):
        return True


class Ball(WorldObj):
    def __init__(self, color='blue'):
        super().__init__('ball', color)

    def can_pickup(self):
        return True


class Box(WorldObj):
    def __init__(self, color, contains=None):
        super().__init__('box', color)
        self.contains = contains

    def can_pickup(self):
        return True

    def toggle(self, env, pos):
        env.grid.set(pos[0], pos[1], self.contains)
        return True


class Grid:
    tile_cache = {}

    def __init__(self, width, height):
        assert width >= 3 and height >= 3
        self.width = width
        self.height = height
        self.grid = [None] * (width * height)

    def __contains__(self, key):
        if isinstance(key, WorldObj):
            return key in self.grid
        return False

    def set(self, i, j, v):
        assert 0 <= i < self.width and 0 <= j < self.height
        self.grid[j * self.width + i] = v

    def get(self, i, j):
        assert 0 <= i < self.width and 0 <= j < self.height
        return self.grid[j * self.width + i]

    def horz_wall(self, x, y, length=None, obj_type=Wall):
        if length is None:
            length = self.width - x
        for i in range(length):
            self.set(x + i, y, obj_type())

    def vert_wall(self, x, y, length=None, obj_type=Wall):
        if length is None:
            length = self.height - y
        for j in range(length):
            self.set(x, y + j, obj_type())

    def wall_rect(self, x, y, w, h):
        self.horz_wall(x, y, w)
        self.horz_wall(x, y + h - 1, w)
        self.vert_wall(x, y, h)
        self.vert_wall(x + w - 1, y, h)

    def encode(self, vis_mask=None):
        if vis_mask is None:
            vis_mask = np.ones((self.width, self.height), dtype=bool)
        array = np.zeros((self.width, self.height, 3), dtype='uint8')
        for i in range(self.width):
            for j in range(self.height):
                if vis_mask[i, j]:
                    v = self.get(i, j)
                    if v is None:
                        array[i, j, 0] = OBJECT_TO_IDX['empty']
                        array[i, j, 1] = 0
                        array[i, j, 2] = 0
                    else:
                        array[i, j, :] = v.encode()
        return array

    def process_vis(grid, agent_pos):
        mask = np.zeros((grid.width, grid.height), dtype=bool)
        mask[agent_pos[0], agent_pos[1]] = True
        for j in reversed(range(0, grid.height)):
            for i in range(0, grid.width - 1):
                if not mask[i, j]:
                    continue
                cell = grid.get(i, j)
                if cell and not cell.see_behind():
                    continue
                mask[i + 1, j] = True
                if j > 0:
                    mask[i + 1, j - 1] = True
                    mask[i, j - 1] = True
            for i in reversed(range(1, grid.width)):
                if not mask[i, j]:
                    continue
                cell = grid.get(i, j)
                if cell and not cell.see_behind():
                    continue
                mask[i - 1, j] = True
                if j > 0:
                    mask[i - 1, j - 1] = True
                    mask[i, j - 1] = True
        for j in range(0, grid.height):
            for i in range(0, grid.width):
                if not mask[i, j]:
                    grid.set(i, j, None)
        return mask


class MiniGridEnv:
    """Base-class subset: Actions enum, RandomState seeding, _reward."""

    class Actions(IntEnum):
        left = 0
        right = 1
        forward = 2
        pickup = 3
        drop = 4
        toggle = 5
        done = 6

    def seed(self, seed=None):
        self.np_random = np.random.RandomState(seed)
        return [seed]

    def _rand_int(self, low, high):
        return self.np_random.randint(low, high)

    def _rand_elem(self, iterable):
        lst = list(iterable)
        return lst[self._rand_int(0, len(lst))]

    def _reward(self):
        return 1 - 0.9 * (self.step_count / self.max_steps)

    def put_obj(self, obj, i, j):
        self.grid.set(i, j, obj)
        obj.init_pos = (i, j)
        obj.cur_pos = (i, j)


def install_minigrid_shim():
    install_gym_shim()
    if 'gym_minigrid' in sys.modules:
        return sys.modules['gym_minigrid.minigrid']

    pkg = types.ModuleType('gym_minigrid')
    minigrid = types.ModuleType('gym_minigrid.minigrid')
    for name, val in globals().items():
        if name in ('TILE_PIXELS', 'COLORS', 'COLOR_TO_IDX', 'IDX_TO_COLOR',
                    'OBJECT_TO_IDX', 'IDX_TO_OBJECT', 'DIR_TO_VEC',
                    'WorldObj', 'Goal', 'Floor', 'Lava', 'Wall', 'Door',
                    'Key', 'Ball', 'Box', 'Grid', 'MiniGridEnv'):
            setattr(minigrid, name, val)

    rendering = types.ModuleType('gym_minigrid.rendering')

    def _no_render(*a, **k):
        raise NotImplementedError('rendering not available in shim')

    for fn in ('fill_coords', 'point_in_rect', 'point_in_triangle',
               'point_in_circle', 'point_in_line', 'rotate_fn',
               'highlight_img', 'downsample'):
        setattr(rendering, fn, _no_render)

    pkg.minigrid = minigrid
    pkg.rendering = rendering
    sys.modules['gym_minigrid'] = pkg
    sys.modules['gym_minigrid.minigrid'] = minigrid
    sys.modules['gym_minigrid.rendering'] = rendering
    return minigrid


def load_reference_multigrid():
    """Import /root/reference's envs.multigrid package under the shims.

    Parent packages are registered EMPTY (their __init__.py re-exports
    trigger a circular import under this loading order); the submodules
    themselves then import normally via the package __path__.
    """
    install_minigrid_shim()
    if 'envs.multigrid.adversarial' in sys.modules:
        return sys.modules['envs.multigrid.adversarial']
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    import importlib

    for name, path in (('envs', '/root/reference/envs'),
                       ('envs.multigrid', '/root/reference/envs/multigrid')):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            pkg.__package__ = name
            sys.modules[name] = pkg
    return importlib.import_module('envs.multigrid.adversarial')
