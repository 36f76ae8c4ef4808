"""Level screenshot dumps (reference train.py:204-232 + util/save_images).

MultiGrid levels render host-side from their (W, H, 3) encodings (no GL);
CarRacing saves the current rasterized frame; BipedalWalker writes level
parameter CSVs (the reference does the same — bipedalwalker/__init__.py).
"""

from __future__ import annotations

import csv
import os

import numpy as np

# cell colors (gym_minigrid render palette, approximate)
_COLORS = {
    1: (0, 0, 0),          # empty → black
    2: (100, 100, 100),    # wall → grey
    8: (0, 200, 0),        # goal → green
    9: (255, 60, 0),       # lava → orange-red
    10: (60, 120, 255),    # agent → blue
}


def render_multigrid_level(encoding: np.ndarray, tile: int = 16) -> np.ndarray:
    """(W, H, 3) encoding → (H*tile, W*tile, 3) uint8 image."""
    types = encoding[..., 0]
    W, H = types.shape
    img = np.zeros((H, W, 3), np.uint8)
    for t, c in _COLORS.items():
        img[types.T == t] = c
    img = np.kron(img, np.ones((tile, tile, 1), np.uint8))
    return img


def _save_png(path: str, img: np.ndarray):
    try:
        from PIL import Image
        Image.fromarray(img).save(path)
    except ImportError:
        np.save(path + '.npy', img)


def save_level_screenshots(env_name: str, levels: np.ndarray, out_dir: str,
                           prefix: str, max_images: int = 4):
    """Dump a batch of level visualizations/descriptions."""
    os.makedirs(out_dir, exist_ok=True)
    levels = np.asarray(levels)
    if env_name.startswith('MultiGrid'):
        tiles = [render_multigrid_level(lv) for lv in levels[:max_images]]
        grid = np.concatenate(tiles, axis=1)
        _save_png(os.path.join(out_dir, f'{prefix}.png'), grid)
    elif env_name.startswith('BipedalWalker'):
        # level params CSV (reference BIPEDALWALKER_DF_COLUMNS)
        cols = ['ground_roughness', 'pit_gap_low', 'pit_gap_high',
                'stump_height_low', 'stump_height_high',
                'stair_height_low', 'stair_height_high', 'stair_steps',
                'seed_bits']
        with open(os.path.join(out_dir, f'{prefix}.csv'), 'w',
                  newline='') as f:
            w = csv.writer(f)
            w.writerow(cols)
            for lv in levels[:max_images * 4]:
                w.writerow([f'{x:.4f}' for x in lv])
    elif env_name.startswith('CarRacing'):
        with open(os.path.join(out_dir, f'{prefix}.csv'), 'w',
                  newline='') as f:
            w = csv.writer(f)
            w.writerow([f'cp_{i}' for i in range(levels.shape[1])])
            for lv in levels[:max_images * 4]:
                w.writerow([f'{x:.3f}' for x in lv])
