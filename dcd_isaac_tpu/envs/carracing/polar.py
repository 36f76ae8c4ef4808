"""Classic polar-checkpoint track generator (host-side numpy).

Faithful re-derivation of the original gym CarRacing track walk as kept by
the reference for `CarRacing-Vanilla-v0`
(car_racing_bezier.py:428-621, `_create_track_polar`): C checkpoints on a
noisy polar grid, a turn-rate-limited steering walk connecting them, lap
closure detection, and trimming to one closed loop between start-alpha
crossings.

Runs host-side: vanilla tracks only serve the zero-shot eval suite (the
training distribution is Bézier), so there is no need for a jit version —
the generated polyline feeds the same on-device Track engine as F1 data.
"""

from __future__ import annotations

import math

import numpy as np

from .track import SCALE, TRACK_RAD

TRACK_DETAIL_STEP = 21 / SCALE
TRACK_TURN_RATE = 0.31
POLAR_CAPACITY = 512     # generated loops measure ~260-300 points


def generate_polar_track(np_rng: np.random.RandomState,
                         n_control_points: int = 12,
                         min_rad_ratio: float = 1 / 3,
                         max_rad_ratio: float = 1.0):
    """→ (points (n, 2) float32) or None on a failed walk."""
    C = n_control_points
    min_rad = TRACK_RAD * min_rad_ratio
    max_rad = TRACK_RAD * max_rad_ratio

    checkpoints = []
    for c in range(C):
        noise = np_rng.uniform(0, 2 * math.pi / C)
        alpha = 2 * math.pi * c / C + noise
        rad = np_rng.uniform(min_rad, max_rad)
        if c == 0:
            alpha, rad = 0.0, 1.5 * TRACK_RAD
        if c == C - 1:
            alpha, rad = 2 * math.pi * c / C, 1.5 * TRACK_RAD
        checkpoints.append((alpha, rad * math.cos(alpha),
                            rad * math.sin(alpha)))
    start_alpha = 2 * math.pi * (-0.5) / C

    # Turn-rate-limited walk from checkpoint to checkpoint.
    _, x, y = checkpoints[0]
    beta = 0.0
    dest_i = 0
    laps = 0
    track = []
    visited_other_side = False
    for _ in range(2500):
        alpha = math.atan2(y, x)
        if visited_other_side and alpha > 0:
            laps += 1
            visited_other_side = False
        if alpha < 0:
            visited_other_side = True
            alpha += 2 * math.pi

        while True:           # pick the next checkpoint ahead of alpha
            failed = True
            while True:
                dest_alpha, dest_x, dest_y = checkpoints[dest_i % C]
                if alpha <= dest_alpha:
                    failed = False
                    break
                dest_i += 1
                if dest_i % C == 0:
                    break
            if not failed:
                break
            alpha -= 2 * math.pi

        r1x, r1y = math.cos(beta), math.sin(beta)
        p1x, p1y = -r1y, r1x
        proj = r1x * (dest_x - x) + r1y * (dest_y - y)
        while beta - alpha > 1.5 * math.pi:
            beta -= 2 * math.pi
        while beta - alpha < -1.5 * math.pi:
            beta += 2 * math.pi
        proj *= SCALE
        if proj > 0.3:
            beta -= min(TRACK_TURN_RATE, abs(0.001 * proj))
        if proj < -0.3:
            beta += min(TRACK_TURN_RATE, abs(0.001 * proj))
        x += p1x * TRACK_DETAIL_STEP
        y += p1y * TRACK_DETAIL_STEP
        track.append((alpha, x, y))
        if laps > 4:
            break

    # Trim to the closed loop between the last two start-alpha crossings.
    i1 = i2 = -1
    i = len(track)
    while True:
        i -= 1
        if i == 0:
            return None       # failed walk; caller re-seeds
        crossed = track[i][0] > start_alpha >= track[i - 1][0]
        if crossed and i2 == -1:
            i2 = i
        elif crossed and i1 == -1:
            i1 = i
            break
    pts = np.asarray([(p[1], p[2]) for p in track[i1:i2 - 1]], np.float32)
    if len(pts) < 3 or len(pts) > POLAR_CAPACITY:
        return None
    return pts


def generate_polar_level(np_rng: np.random.RandomState,
                         capacity: int = POLAR_CAPACITY) -> np.ndarray:
    """Level encoding for the eval harness: (capacity+1, 2) float32 —
    row 0 holds [n_points, 0]; rows 1: are points padded with the last."""
    pts = None
    while pts is None:
        pts = generate_polar_track(np_rng)
    n = len(pts)
    level = np.zeros((capacity + 1, 2), np.float32)
    level[0, 0] = n
    level[1:n + 1] = pts
    level[n + 1:] = pts[-1]
    return level
