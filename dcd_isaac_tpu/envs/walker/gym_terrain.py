"""Genuine gym BipedalWalker-v3 / BipedalWalkerHardcore-v3 terrain.

The reference evaluates its walker agents on the REAL gym envs
(reference eval.py:354-363), whose terrain state machine differs from the
POET-parameterized generator (walker_env.py:249-395) that drives training
levels: integer pit gaps of 3-4 with 4-step-deep walls, square stumps of
side 1-2, stair runs of 3-4 treads with width 4, and grass sections of
5-9 steps.  This module transcribes gymnasium's
``BipedalWalker._generate_terrain`` exactly — same state machine, same
RNG call sequence on the same ``np.random.Generator`` — so the eval
terrain distribution matches what the published solved-rate baselines
(BASELINE.md: solved = return > 230) were measured on.

Host-side numpy (terrain generation happens once per eval episode, not in
the jitted step), emitting the dense ``Terrain`` arrays consumed by the
JAX contact solver.  Validated live against gymnasium's env in
tests/test_gym_bipedal_terrain.py (exact heightfield + obstacle-poly
match per seed).
"""

from __future__ import annotations

import numpy as np

from .physics import (
    MAX_BOXES, SCALE, TERRAIN_GRASS, TERRAIN_HEIGHT, TERRAIN_LENGTH,
    TERRAIN_STARTPAD, TERRAIN_STEP,
)

GRASS, STUMP, STAIRS, PIT, _STATES_ = range(5)


def generate_gym_terrain(hardcore: bool, rng: np.random.Generator):
    """→ (xs (L,), ys (L,), boxes (K, 4) AABBs, n_boxes).

    Box list: pit walls (2 per pit), stumps (1), stair treads (3-4) —
    the same static fixtures gymnasium creates, as axis-aligned boxes
    (all gym obstacle polys are axis-aligned rectangles).
    """
    state = GRASS
    velocity = 0.0
    y = TERRAIN_HEIGHT
    counter = TERRAIN_STARTPAD
    oneshot = False
    xs, ys, boxes = [], [], []
    stair_steps = stair_width = stair_height = 0
    original_y = 0.0

    for i in range(TERRAIN_LENGTH):
        x = i * TERRAIN_STEP
        xs.append(x)

        if state == GRASS and not oneshot:
            velocity = 0.8 * velocity + 0.01 * np.sign(TERRAIN_HEIGHT - y)
            if i > TERRAIN_STARTPAD:
                velocity += rng.uniform(-1, 1) / SCALE
            y += velocity

        elif state == PIT and oneshot:
            counter = int(rng.integers(3, 5))
            boxes.append((x, y - 4 * TERRAIN_STEP, x + TERRAIN_STEP, y))
            boxes.append((x + TERRAIN_STEP * counter, y - 4 * TERRAIN_STEP,
                          x + TERRAIN_STEP * (counter + 1), y))
            counter += 2
            original_y = y

        elif state == PIT and not oneshot:
            y = original_y
            if counter > 1:
                y -= 4 * TERRAIN_STEP

        elif state == STUMP and oneshot:
            counter = int(rng.integers(1, 3))
            boxes.append((x, y, x + counter * TERRAIN_STEP,
                          y + counter * TERRAIN_STEP))

        elif state == STAIRS and oneshot:
            stair_height = +1 if rng.random() > 0.5 else -1
            stair_width = int(rng.integers(4, 5))
            stair_steps = int(rng.integers(3, 5))
            original_y = y
            for s in range(stair_steps):
                x0 = x + (s * stair_width) * TERRAIN_STEP
                x1 = x + ((1 + s) * stair_width) * TERRAIN_STEP
                y1 = y + (s * stair_height) * TERRAIN_STEP
                y0 = y + (-1 + s * stair_height) * TERRAIN_STEP
                boxes.append((x0, y0, x1, y1))
            counter = stair_steps * stair_width

        elif state == STAIRS and not oneshot:
            s = stair_steps * stair_width - counter - stair_height
            n = s / stair_width
            y = original_y + (n * stair_height) * TERRAIN_STEP

        oneshot = False
        ys.append(y)
        counter -= 1
        if counter == 0:
            counter = int(rng.integers(TERRAIN_GRASS / 2, TERRAIN_GRASS))
            if state == GRASS and hardcore:
                state = int(rng.integers(1, _STATES_))
                oneshot = True
            else:
                state = GRASS
                oneshot = True

    return (np.asarray(xs, np.float32), np.asarray(ys, np.float32),
            np.asarray(boxes, np.float32).reshape(-1, 4), len(boxes))


# --- dense level encoding for the Evaluator ---------------------------------
# [xs (L), ys (L), boxes (MAX_BOXES*4), n_boxes, seed] as one float32 vector
GYM_LEVEL_DIM = 2 * TERRAIN_LENGTH + MAX_BOXES * 4 + 2


def encode_gym_level(hardcore: bool, seed: int) -> np.ndarray:
    """Terrain for one eval episode, packed for vmapped reset_to_level."""
    rng = np.random.Generator(np.random.PCG64(seed))
    xs, ys, boxes, n = generate_gym_terrain(hardcore, rng)
    if n > MAX_BOXES:   # never observed (max ≈ 3/4 MAX_BOXES); fail loudly
        raise ValueError(f'gym terrain produced {n} boxes > {MAX_BOXES}')
    bpad = np.zeros((MAX_BOXES, 4), np.float32)
    bpad[:n] = boxes
    out = np.concatenate([
        xs, ys, bpad.reshape(-1),
        np.asarray([n], np.float32),
        np.asarray([seed % (1 << 24)], np.float32)])
    return out.astype(np.float32)


def decode_gym_level(level):
    """jnp-friendly decode: level (GYM_LEVEL_DIM,) → Terrain fields."""
    L = TERRAIN_LENGTH
    xs = level[:L]
    ys = level[L:2 * L]
    boxes = level[2 * L:2 * L + MAX_BOXES * 4].reshape(MAX_BOXES, 4)
    n_boxes = level[2 * L + MAX_BOXES * 4].astype('int32')
    # seed stored as an exact float32 value in [0, 2^24) (envs/seeds.py);
    # only used for the walker's initial-state noise, never terrain regen
    seed = level[2 * L + MAX_BOXES * 4 + 1]
    return xs, ys, boxes, n_boxes, seed
