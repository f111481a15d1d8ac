"""Annotation file IO (reference utils.py:80-86, 469-475).

Annotation line format (reference README.md:84-93):
    img_name.jpg x1,y1,x2,y2,class_id x1,y1,x2,y2,class_id ...
"""

from __future__ import annotations

from typing import List, Optional


def read_annotation_lines(annotation_path: str, test_size: Optional[float] = None,
                          random_seed: int = 5566, shard=None):
    """Read annotation lines, optionally returning a seeded train/val split
    (reference utils.py:80-86, sklearn split with seed 5566).

    ``shard=(process_id, num_processes)`` keeps every num_processes-th line
    for this process — the multi-host data recipe (each host feeds its own
    DataGenerator; see parallel.mesh.init_distributed).  Pass
    ``(jax.process_index(), jax.process_count())``.  Applied AFTER the
    train/val split so every host derives the shards from the identical
    seeded split.
    """
    with open(annotation_path) as f:
        lines = f.readlines()

    def _shard(ls):
        if shard is None:
            return ls
        pid, n = shard
        if not 0 <= pid < n:
            raise ValueError(f"shard process_id {pid} not in [0, {n})")
        return ls[pid::n]

    if test_size:
        from sklearn.model_selection import train_test_split
        train, val = train_test_split(lines, test_size=test_size,
                                      random_state=random_seed)
        return _shard(train), _shard(val)
    return _shard(lines)


def read_txt_to_list(path: str) -> List[str]:
    """File -> stripped lines (reference utils.py:469-475)."""
    with open(path) as f:
        return [x.strip() for x in f.readlines()]


def parse_annotation_line(line: str):
    """One annotation line -> (img_name, [[x1,y1,x2,y2,cls], ...])."""
    parts = line.split()
    boxes = [[float(v) for v in b.split(",")] for b in parts[1:]]
    return parts[0], boxes
