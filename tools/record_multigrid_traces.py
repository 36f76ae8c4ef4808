"""Record golden traces from the REFERENCE MultiGrid (VERDICT r1 item 3).

Executes /root/reference/envs/multigrid/adversarial.py (pure python+numpy,
via tools/minigrid_shim.py) under fixed adversary + student action scripts
and saves exact obs/reward/done sequences + grid encodings to
tests/fixtures/multigrid_ref_traces.npz.

tests/test_multigrid_golden_trace.py replays the same scripts through the
JAX engine and asserts byte-exact parity.

Run manually when regenerating fixtures:
    python tools/record_multigrid_traces.py
"""

import sys

import numpy as np

sys.path.insert(0, 'tools')
from minigrid_shim import load_reference_multigrid  # noqa: E402

OUT = 'tests/fixtures/multigrid_ref_traces.npz'


def bfs_actions(encoding, start_pos, start_dir, goal_pos, max_len=100):
    """Plan turn/forward actions from start to goal on the encoded grid."""
    types = encoding[:, :, 0]
    W, H = types.shape
    walk = (types != 2) & (types != 9)  # not wall, not lava
    from collections import deque
    start = tuple(int(v) for v in start_pos)
    goal = tuple(int(v) for v in goal_pos)
    prev = {start: None}
    q = deque([start])
    while q:
        cur = q.popleft()
        if cur == goal:
            break
        for dx, dy in ((1, 0), (0, 1), (-1, 0), (0, -1)):
            nxt = (cur[0] + dx, cur[1] + dy)
            if 0 <= nxt[0] < W and 0 <= nxt[1] < H \
                    and walk[nxt] and nxt not in prev:
                prev[nxt] = cur
                q.append(nxt)
    if goal not in prev:
        return []
    path = [goal]
    while path[-1] != start:
        path.append(prev[path[-1]])
    path.reverse()

    DIRS = {(1, 0): 0, (0, 1): 1, (-1, 0): 2, (0, -1): 3}
    actions = []
    d = int(start_dir)
    for a, b in zip(path[:-1], path[1:]):
        want = DIRS[(b[0] - a[0], b[1] - a[1])]
        delta = (want - d) % 4
        if delta == 1:
            actions.append(1)          # right
        elif delta == 3:
            actions.append(0)          # left
        elif delta == 2:
            actions.extend([1, 1])
        d = want
        actions.append(2)              # forward
    return actions[:max_len]


def record(ref, name, env_kwargs, adv_actions, student_script=None,
           solve=False):
    env = ref.AdversarialEnv(**env_kwargs)
    env.reset()
    for a in adv_actions:
        obs, r, done, info = env.step_adversary(int(a))
    assert done, 'adversary episode must complete'
    encoding = env.grid.encode()

    obs0 = env.reset_agent()
    rec = {
        'adv_actions': np.asarray(adv_actions, np.int64),
        'encoding': encoding,
        'agent_start_pos': np.asarray(env.agent_start_pos, np.int64),
        'agent_start_dir': np.int64(env.agent_start_dir),
        'goal_pos': np.asarray(env.goal_pos, np.int64),
        'passable': np.bool_(env.passable),
        'shortest_path_length': np.int64(env.shortest_path_length),
        'n_clutter_placed': np.int64(env.n_clutter_placed),
        'obs0_image': np.asarray(obs0['image'], np.uint8),
        'obs0_direction': np.int64(env.agent_dir[0]),
    }

    if solve:
        student_script = bfs_actions(
            encoding, env.agent_start_pos, env.agent_start_dir, env.goal_pos)
        # net-zero spin at the start to exercise turns without moving
        student_script = [0, 1, 1, 0] + student_script
    images, dirs, rewards, dones = [], [], [], []
    for a in student_script:
        obs, r, done, info = env.step(int(a))
        images.append(np.asarray(obs['image'], np.uint8))
        dirs.append(int(np.asarray(obs['direction']).reshape(-1)[0]))
        rewards.append(float(r))
        dones.append(bool(done))
        if done:
            break
    rec.update({
        'student_actions': np.asarray(student_script[:len(images)], np.int64),
        'images': np.stack(images),
        'directions': np.asarray(dirs, np.int64),
        'rewards': np.asarray(rewards, np.float64),
        'dones': np.asarray(dones, bool),
    })
    print(f'{name}: adv={len(adv_actions)} student={len(images)} '
          f'solved={rewards[-1] > 0} final_r={rewards[-1]:.4f} '
          f'spl={rec["shortest_path_length"]}')
    return rec


def main():
    ref = load_reference_multigrid()
    rng = np.random.RandomState(3)

    traces = {}

    # 25-block goal-last (the paper's main setting), BFS-solved student
    adv = [(t * 37) % 169 for t in range(25)] + [5, 160]
    traces['goal_last_25'] = record(
        ref, 'goal_last_25',
        dict(size=15, n_clutter=25, choose_goal_last=True, seed=7),
        adv, solve=True)

    # opaque walls: exercises the see_through_walls=False occlusion path
    traces['opaque_25'] = record(
        ref, 'opaque_25',
        dict(size=15, n_clutter=25, choose_goal_last=True,
             see_through_walls=False, seed=11),
        adv, solve=True)

    # goal-first 50-block default; student bumps walls and spins
    adv50 = [3, 40] + [int(rng.randint(0, 169)) for _ in range(50)]
    script = [2, 2, 1, 2, 2, 0, 2, 1, 1, 2, 2, 2, 0, 2, 2, 1, 2, 2, 2, 0,
              2, 2, 2, 2, 1, 2, 0, 2, 2, 2]
    traces['goal_first_50'] = record(
        ref, 'goal_first_50',
        dict(size=15, n_clutter=50, choose_goal_last=False, seed=5),
        adv50, student_script=script)

    # duplicate-cell no-ops: same wall cell repeatedly, wall on goal cell
    adv_dup = [10, 20] + [30] * 10 + [10, 20, 30] + [44] * 12
    traces['dup_cells'] = record(
        ref, 'dup_cells',
        dict(size=15, n_clutter=25, choose_goal_last=False, seed=9),
        adv_dup, student_script=[2] * 20)

    flat = {}
    for name, tr in traces.items():
        for k, v in tr.items():
            flat[f'{name}/{k}'] = v
    np.savez_compressed(OUT, **flat)
    print('wrote', OUT)


if __name__ == '__main__':
    main()
