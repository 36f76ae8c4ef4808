"""Zero-shot transfer evaluation environments (level builders).

Host-side numpy generators producing (W, H, 3) uint8 level encodings for the
reference's OOD MultiGrid suite: hand-designed bitmap mazes
(envs/multigrid/maze.py:23-467), Kruskal MST perfect mazes
(mst_maze.py:17-163), SimpleCrossing/LavaCrossing (crossing.py), FourRooms
(fourrooms.py:14-113) and cluttered DR envs (cluttered.py).  The bitmap
layouts are the published benchmark level data from Dennis et al. 2020 /
Jiang et al. 2021, transcribed as string maps.

Levels are built once per evaluation batch on host (they are eval data, not
training hot path) and played through the jitted engine via
``AdversarialMultiGrid.reset_to_level``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from .constants import AGENT, EMPTY, GOAL, LAVA, WALL
from .core import MultiGridParams

# Color table mirror of constants.TYPE_COLOR for host-side encoding.
_TYPE_COLOR = np.zeros(11, np.uint8)
_TYPE_COLOR[WALL] = 5
_TYPE_COLOR[GOAL] = 1
_TYPE_COLOR[LAVA] = 0


def encode_level(grid_xy: np.ndarray, start: Tuple[int, int], start_dir: int,
                 goal: Tuple[int, int]) -> np.ndarray:
    """(W, H) type grid + agent/goal → (W, H, 3) encoding."""
    g = grid_xy.astype(np.uint8)
    g[goal[0], goal[1]] = GOAL
    enc = np.stack([g, _TYPE_COLOR[g], np.zeros_like(g)], -1)
    enc[start[0], start[1]] = (AGENT, 0, start_dir)
    return enc


def _grid_from_bitmap(bitmap_rows, size, wall=WALL) -> np.ndarray:
    """String rows ('#'=obstacle) indexed [y][x] → (W, H) grid with border."""
    g = np.full((size, size), EMPTY, np.uint8)
    g[0, :] = g[-1, :] = g[:, 0] = g[:, -1] = WALL
    for y, row in enumerate(bitmap_rows):
        for x, c in enumerate(row):
            if c == '#':
                g[x + 1, y + 1] = wall
    return g


@dataclasses.dataclass(frozen=True)
class EvalEnvSpec:
    """One evaluation environment: static params + a batch level builder."""
    name: str
    params: MultiGridParams
    build: Callable[[np.random.RandomState, int], np.ndarray]  # → (n, W, H, 3)
    solved_threshold: float = 0.0  # return > threshold counts as solved


def _fixed(name, size, rows, start, goal, max_steps=None):
    max_steps = max_steps or 2 * size * size
    grid = _grid_from_bitmap(rows, size)
    level = encode_level(grid.copy(), start, 0, goal)

    def build(rng, n):
        return np.repeat(level[None], n, 0)

    return EvalEnvSpec(
        name, MultiGridParams(size=size, max_steps=max_steps), build)


# --- published bitmap layouts, transcribed from reference maze.py ---------
_MAZE = [
    '.....#....#..',
    '.###.####.##.',
    '.#...........',
    '.########.###',
    '........#....',
    '######.#####.',
    '....#..#.....',
    '.##...##.####',
    '..#.#..#...#.',
    '#.#.##.###.#.',
    '#.#..#...#...',
    '#.##.###.###.',
    '...#...#.#...',
]

_MAZE2 = [
    '...#.#....#..',
    '.#.#.####...#',
    '.#........#..',
    '.########.###',
    '...#..#.#.#..',
    '##.#.##.#.#..',
    '.#.#....#.##.',
    '.#.##.###..#.',
    '.#..#..###.#.',
    '.##.##.#.#.#.',
    '.#...#.#.#.#.',
    '.#.#.#.#.#.#.',
    '...#...#.....',
]

_MAZE3 = [
    '....#.#......',
    '.####.#.####.',
    '.#....#.#....',
    '...####.#.#.#',
    '##.#....#.#..',
    '...#.##.#.##.',
    '.#.#.#..#..#.',
    '.#.#.#.###.##',
    '.#...#.#.#...',
    '.###.#.#.###.',
    '.#...#.#...#.',
    '.#.###.#.#.#.',
    '.#...#...#...',
]

_LABYRINTH = [
    '.............',
    '.###########.',
    '.#.........#.',
    '.#.#######.#.',
    '.#.#.....#.#.',
    '.#.#.###.#.#.',
    '.#.#.#.#.#.#.',
    '.#.#.#.#.#.#.',
    '.#...#...#.#.',
    '.#########.#.',
    '.....#.....#.',
    '####.#.#####.',
    '.....#.......',
]

_LABYRINTH2 = [
    '.#...........',
    '.#.#########.',
    '.#.#.......#.',
    '.#.#.#####.#.',
    '.#.#.#...#.#.',
    '...#.#.#.#.#.',
    '####.#.#.#.#.',
    '...#.###.#.#.',
    '.#.#.....#.#.',
    '.#.#######.#.',
    '.#.........#.',
    '.###########.',
    '.............',
]

_NINE_ROOMS = [
    '........#....',
    '....#........',
    '....#...#....',
    '....#...#....',
    '#.###.######.',
    '....#........',
    '........#....',
    '....#...#....',
    '###.###.##.##',
    '....#...#....',
    '........#....',
    '....#........',
    '....#...#....',
]

_NINE_ROOMS_FEWER = [
    '....#...#....',
    '....#........',
    '....#...#....',
    '....#...#....',
    '#.###.######.',
    '....#...#....',
    '........#....',
    '....#...#....',
    '###.##.###.##',
    '....#...#....',
    '........#....',
    '....#...#....',
    '....#...#....',
]

_SIXTEEN_ROOMS = [
    '...#..#..#...',
    '.........#...',
    '...#..#......',
    '#.###.##.###.',
    '...#.........',
    '......#..#...',
    '##.#.##.###.#',
    '...#.....#...',
    '...#..#......',
    '.####.##.#.##',
    '...#..#..#...',
    '......#......',
    '...#.....#...',
]

_SIXTEEN_ROOMS_FEWER = [
    '...#.....#...',
    '......#..#...',
    '...#..#..#...',
    '####.##.###.#',
    '...#..#......',
    '......#..#...',
    '#.#####.#####',
    '...#..#..#...',
    '...#.........',
    '##.##.##.####',
    '...#..#..#...',
    '......#......',
    '...#..#..#...',
]

_SMALL_CORRIDOR = [
    '.............',
    '.#.#.#.#.#.#.',
    '.#.#.#.#.#.#.',
    '.#.#.#.#.#.#.',
    '.#.#.#.#.#.#.',
    '.#.#.#.#.#.#.',
    '.###########.',
    '.#.#.#.#.#.#.',
    '.#.#.#.#.#.#.',
    '.#.#.#.#.#.#.',
    '.#.#.#.#.#.#.',
    '.#.#.#.#.#.#.',
    '.............',
]

_LARGE_CORRIDOR = (
    ['.' * 19]
    + ['.#' * 9 + '.'] * 8
    + ['.' + '#' * 17 + '.']
    + ['.#' * 9 + '.'] * 8
    + ['.' * 19]
)

_MINI_MAZE = [
    '....',
    '###.',
    '.#..',
    '...#',
]

_MEDIUM_MAZE = [
    '.#...##.',
    '.#.#.#..',
    '.#.####.',
    '.....#..',
    '####.#.#',
    '........',
    '.######.',
    '...#....',
]


def _corridor_spec(name, rows, size, start, goal_rows, goal_cols):
    grid = _grid_from_bitmap(rows, size)
    max_steps = 2 * size * size

    def build(rng, n):
        out = np.empty((n, size, size, 3), np.uint8)
        for i in range(n):
            goal = (int(rng.choice(goal_cols)), int(rng.choice(goal_rows)))
            out[i] = encode_level(grid.copy(), start, 0, goal)
        return out

    return EvalEnvSpec(
        name, MultiGridParams(size=size, max_steps=max_steps), build)


def _kruskal_maze(rng: np.random.RandomState, size: int) -> np.ndarray:
    """Randomized-Kruskal perfect maze bitmap (mst_maze.py:55-94)."""
    n = size - 2
    assert n % 2 == 1
    h = n // 2 + 1
    grid = np.ones((n, n), bool)  # True = wall
    cells = [(y, x) for y in range(h) for x in range(h)]
    for (y, x) in cells:
        grid[2 * y, 2 * x] = False
    parent = {c: c for c in cells}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    edges = []
    for (y, x) in cells:
        if y + 1 < h:
            edges.append(((y, x), (y + 1, x)))
        if x + 1 < h:
            edges.append(((y, x), (y, x + 1)))
    rng.shuffle(edges)
    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            wy = u[0] * 2 + (v[0] - u[0])
            wx = u[1] * 2 + (v[1] - u[1])
            grid[wy, wx] = False
    g = np.full((size, size), EMPTY, np.uint8)
    g[0, :] = g[-1, :] = g[:, 0] = g[:, -1] = WALL
    # bitmap is [y][x]
    g[1:-1, 1:-1] = np.where(grid.T, WALL, EMPTY)
    return g


def _perfect_maze_spec(name, size):
    def build(rng, n):
        out = np.empty((n, size, size, 3), np.uint8)
        corners = [(1, 1), (size - 2, 1), (1, size - 2), (size - 2, size - 2)]
        for i in range(n):
            g = _kruskal_maze(rng, size)
            a, b = rng.choice(4, size=2, replace=False)
            out[i] = encode_level(g, corners[a], 0, corners[b])
        return out

    return EvalEnvSpec(
        name, MultiGridParams(size=size, max_steps=2 * size * size), build)


def _crossing_spec(name, size, num_crossings, lava: bool):
    """SimpleCrossing / LavaCrossing generator (crossing.py:40-95)."""
    obstacle = LAVA if lava else WALL

    def build(rng, n):
        out = np.empty((n, size, size, 3), np.uint8)
        for i in range(n):
            g = np.full((size, size), EMPTY, np.uint8)
            g[0, :] = g[-1, :] = g[:, 0] = g[:, -1] = WALL
            rivers = [('v', j) for j in range(2, size - 2, 2)]
            rivers += [('h', j) for j in range(2, size - 2, 2)]
            rng.shuffle(rivers)
            rivers = rivers[:num_crossings]
            rivers_v = sorted(p for d, p in rivers if d == 'v')
            rivers_h = sorted(p for d, p in rivers if d == 'h')
            for j in rivers_h:
                g[1:size - 1, j] = obstacle
            for i_ in rivers_v:
                g[i_, 1:size - 1] = obstacle
            path = ['h'] * len(rivers_v) + ['v'] * len(rivers_h)
            rng.shuffle(path)
            limits_v = [0] + rivers_v + [size - 1]
            limits_h = [0] + rivers_h + [size - 1]
            room_i = room_j = 0
            for d in path:
                if d == 'h':
                    x = limits_v[room_i + 1]
                    y = rng.choice(
                        range(limits_h[room_j] + 1, limits_h[room_j + 1]))
                    room_i += 1
                else:
                    x = rng.choice(
                        range(limits_v[room_i] + 1, limits_v[room_i + 1]))
                    y = limits_h[room_j + 1]
                    room_j += 1
                g[x, y] = EMPTY
            out[i] = encode_level(g, (1, 1), 0, (size - 2, size - 2))
        return out

    # reference crossing.py:28 sets see_through_walls=False (occluded
    # views), unlike the maze suite's True
    return EvalEnvSpec(
        name,
        MultiGridParams(size=size, max_steps=4 * size * size,
                        see_through_walls=False), build)


def _four_rooms_spec(name='MiniGrid-FourRooms-v0', size=19, max_steps=100):
    def build(rng, n):
        out = np.empty((n, size, size, 3), np.uint8)
        for i in range(n):
            g = np.full((size, size), EMPTY, np.uint8)
            g[0, :] = g[-1, :] = g[:, 0] = g[:, -1] = WALL
            room = size // 2
            g[room, :] = WALL
            g[:, room] = WALL
            # doorways (fourrooms.py:58-69)
            g[room, rng.randint(1, room)] = EMPTY
            g[room, rng.randint(room + 1, size - 1)] = EMPTY
            g[rng.randint(1, room), room] = EMPTY
            g[rng.randint(room + 1, size - 1), room] = EMPTY
            free = np.argwhere(g == EMPTY)
            a, b = rng.choice(len(free), size=2, replace=False)
            start, goal = tuple(free[a]), tuple(free[b])
            out[i] = encode_level(g, start, rng.randint(0, 4), goal)
        return out

    # reference fourrooms.py inherits MultiGridEnv's default
    # see_through_walls=False (multigrid.py:350) — occluded views
    return EvalEnvSpec(
        name,
        MultiGridParams(size=size, max_steps=max_steps,
                        see_through_walls=False), build)


def _cluttered_spec(name, size, n_clutter, max_steps, lava=False):
    obstacle = LAVA if lava else WALL

    def build(rng, n):
        out = np.empty((n, size, size, 3), np.uint8)
        for i in range(n):
            g = np.full((size, size), EMPTY, np.uint8)
            g[0, :] = g[-1, :] = g[:, 0] = g[:, -1] = WALL
            free = np.argwhere(g == EMPTY)
            picks = rng.choice(len(free), size=n_clutter + 2, replace=False)
            for p in picks[:n_clutter]:
                g[tuple(free[p])] = obstacle
            start = tuple(free[picks[-2]])
            goal = tuple(free[picks[-1]])
            out[i] = encode_level(g, start, rng.randint(0, 4), goal)
        return out

    # reference cluttered.py inherits MultiGridEnv's default
    # see_through_walls=False (multigrid.py:350) — occluded views
    return EvalEnvSpec(
        name,
        MultiGridParams(size=size, max_steps=max_steps,
                        see_through_walls=False), build)


def _build_registry() -> Dict[str, EvalEnvSpec]:
    specs = [
        _fixed('MultiGrid-Maze-v0', 15, _MAZE, (7, 1), (7, 13)),
        _fixed('MultiGrid-Maze2-v0', 15, _MAZE2, (1, 7), (13, 5)),
        _fixed('MultiGrid-Maze3-v0', 15, _MAZE3, (4, 1), (13, 7)),
        _fixed('MultiGrid-Labyrinth-v0', 15, _LABYRINTH, (1, 13), (7, 7)),
        _fixed('MultiGrid-Labyrinth2-v0', 15, _LABYRINTH2, (1, 1), (7, 7)),
        _fixed('MultiGrid-NineRooms-v0', 15, _NINE_ROOMS, (2, 2), (12, 12)),
        _fixed('MultiGrid-NineRoomsFewerDoors-v0', 15, _NINE_ROOMS_FEWER,
               (2, 2), (12, 12)),
        _fixed('MultiGrid-SixteenRooms-v0', 15, _SIXTEEN_ROOMS, (2, 2),
               (12, 12)),
        _fixed('MultiGrid-SixteenRoomsFewerDoors-v0', 15,
               _SIXTEEN_ROOMS_FEWER, (2, 2), (12, 12)),
        _fixed('MultiGrid-MiniMaze-v0', 6, _MINI_MAZE, (1, 1), (1, 3)),
        _fixed('MultiGrid-MediumMaze-v0', 10, _MEDIUM_MAZE, (5, 1), (3, 8)),
        _corridor_spec('MultiGrid-SmallCorridor-v0', _SMALL_CORRIDOR, 15,
                       (1, 7), goal_rows=[6, 8], goal_cols=[3, 5, 7, 9, 11]),
        _corridor_spec('MultiGrid-LargeCorridor-v0', _LARGE_CORRIDOR, 21,
                       (1, 10), goal_rows=[9, 11],
                       goal_cols=[3, 5, 7, 9, 11, 13, 15, 17]),
        _perfect_maze_spec('MultiGrid-PerfectMazeSmall-v0', 11),
        _perfect_maze_spec('MultiGrid-PerfectMazeMedium-v0', 21),
        _perfect_maze_spec('MultiGrid-PerfectMazeLarge-v0', 51),
        _perfect_maze_spec('MultiGrid-PerfectMazeXL-v0', 101),
        _crossing_spec('MiniGrid-SimpleCrossingS9N1-v0', 9, 1, False),
        _crossing_spec('MiniGrid-SimpleCrossingS9N2-v0', 9, 2, False),
        _crossing_spec('MiniGrid-SimpleCrossingS9N3-v0', 9, 3, False),
        _crossing_spec('MiniGrid-SimpleCrossingS11N5-v0', 11, 5, False),
        _crossing_spec('MiniGrid-LavaCrossingS9N1-v0', 9, 1, True),
        _crossing_spec('MiniGrid-LavaCrossingS9N2-v0', 9, 2, True),
        _crossing_spec('MiniGrid-LavaCrossingS9N3-v0', 9, 3, True),
        _crossing_spec('MiniGrid-LavaCrossingS11N5-v0', 11, 5, True),
        _four_rooms_spec(),
        _cluttered_spec('MultiGrid-Cluttered40-v0', 15, 40, 250),
        _cluttered_spec('MultiGrid-Cluttered10-v0', 15, 10, 250),
        _cluttered_spec('MultiGrid-Cluttered50-v0', 15, 50, 250),
        _cluttered_spec('MultiGrid-ClutteredMini-v0', 6, 5, 50),
    ]
    return {s.name: s for s in specs}


EVAL_ENVS: Dict[str, EvalEnvSpec] = _build_registry()

# Benchmark suites (eval.py:332-368)
ZS_MINIGRID_BENCHMARK = [
    'MultiGrid-SixteenRooms-v0',
    'MultiGrid-SixteenRoomsFewerDoors-v0',
    'MultiGrid-Labyrinth-v0',
    'MultiGrid-Labyrinth2-v0',
    'MultiGrid-Maze-v0',
    'MultiGrid-Maze2-v0',
    'MultiGrid-LargeCorridor-v0',
    'MultiGrid-PerfectMazeMedium-v0',
    'MultiGrid-PerfectMazeLarge-v0',
    'MultiGrid-PerfectMazeXL-v0',
]
