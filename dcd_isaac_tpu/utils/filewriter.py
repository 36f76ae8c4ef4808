"""Structured experiment logging (reference util/filewriter.py:65-279).

Per-xpid directory with meta.json (full args), logs.csv with a dynamically
growing field set, level_weights.csv / level_seeds.csv for the PLR replay
distribution, final_test_eval.csv, and tick recovery on resume.
"""

from __future__ import annotations

import csv
import datetime
import json
import os
import time
from typing import Dict, Optional


class FileWriter:
    def __init__(self, xpid: str, xp_args: dict, rootdir: str,
                 symlink_to_latest: bool = False):
        self.xpid = xpid
        self.basepath = os.path.join(
            os.path.expandvars(os.path.expanduser(rootdir)), xpid)
        os.makedirs(self.basepath, exist_ok=True)

        self.paths = {
            'msg': os.path.join(self.basepath, 'out.log'),
            'logs': os.path.join(self.basepath, 'logs.csv'),
            'fields': os.path.join(self.basepath, 'fields.csv'),
            'meta': os.path.join(self.basepath, 'meta.json'),
            'level_weights': os.path.join(self.basepath, 'level_weights.csv'),
            'level_seeds': os.path.join(self.basepath, 'level_seeds.csv'),
            'final_test_eval': os.path.join(
                self.basepath, 'final_test_eval.csv'),
        }

        self.metadata = {
            'args': {k: (v if isinstance(v, (int, float, str, bool, list,
                                             type(None))) else str(v))
                     for k, v in xp_args.items()},
            'xpid': xpid,
            'date_start': datetime.datetime.now().isoformat(),
            'successful': False,
        }
        self._save_metadata()

        self.fieldnames = ['_tick', '_time']
        self._tick = 0
        if os.path.exists(self.paths['logs']):
            self._recover_tick()

    def _save_metadata(self):
        with open(self.paths['meta'], 'w') as f:
            json.dump(self.metadata, f, indent=4, sort_keys=True)

    def _recover_tick(self):
        """Resume: continue ticks from the last CSV row
        (filewriter.py:165-183)."""
        try:
            with open(self.paths['logs']) as f:
                reader = csv.reader(f)
                rows = [r for r in reader if r]
            if len(rows) > 1:
                header = None
                for r in rows:
                    if r and r[0].startswith('#'):
                        continue
                    header = r
                    break
                if header and '_tick' in header:
                    idx = header.index('_tick')
                    last = rows[-1]
                    self._tick = int(float(last[idx])) + 1
                    self.fieldnames = header
        except (ValueError, IndexError):
            pass

    @property
    def latest_tick(self) -> int:
        return self._tick

    def log(self, to_log: Dict, tick: Optional[int] = None):
        if tick is not None:
            self._tick = tick
        to_log = dict(to_log)
        to_log['_tick'] = self._tick
        to_log['_time'] = time.time()
        self._tick += 1

        new_fields = [k for k in to_log if k not in self.fieldnames]
        rewrite = bool(new_fields) and os.path.exists(self.paths['logs'])
        self.fieldnames.extend(new_fields)

        if rewrite:
            # re-write the csv with the expanded header
            with open(self.paths['logs']) as f:
                reader = csv.DictReader(
                    (r for r in f if not r.startswith('#')))
                old_rows = list(reader)
            with open(self.paths['logs'], 'w', newline='') as f:
                w = csv.DictWriter(f, fieldnames=self.fieldnames)
                w.writeheader()
                for r in old_rows:
                    w.writerow(r)
        elif not os.path.exists(self.paths['logs']):
            with open(self.paths['logs'], 'w', newline='') as f:
                csv.DictWriter(f, fieldnames=self.fieldnames).writeheader()
            with open(self.paths['fields'], 'w', newline='') as f:
                csv.writer(f).writerow(self.fieldnames)

        with open(self.paths['logs'], 'a', newline='') as f:
            csv.DictWriter(f, fieldnames=self.fieldnames).writerow(to_log)

    def log_level_weights(self, weights, seeds=None):
        with open(self.paths['level_weights'], 'a', newline='') as f:
            csv.writer(f).writerow(list(weights))
        if seeds is not None:
            with open(self.paths['level_seeds'], 'a', newline='') as f:
                csv.writer(f).writerow(list(seeds))

    def log_final_test_eval(self, stats: Dict):
        with open(self.paths['final_test_eval'], 'w', newline='') as f:
            w = csv.DictWriter(f, fieldnames=list(stats.keys()))
            w.writeheader()
            w.writerow(stats)

    def mark_completed(self):
        self.metadata['successful'] = True
        self.metadata['date_end'] = datetime.datetime.now().isoformat()
        self._save_metadata()


class NullFileWriter:
    """No-op writer for non-zero ranks on pod slices (single-writer
    discipline: only process 0 owns the xpid directory)."""

    basepath = ''
    latest_tick = 0

    def log(self, to_log, tick=None):
        pass

    def log_level_weights(self, weights, seeds=None):
        pass

    def log_final_test_eval(self, stats):
        pass

    def mark_completed(self):
        pass
