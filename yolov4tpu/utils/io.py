"""Annotation file IO (reference utils.py:80-86, 469-475).

Annotation line format (reference README.md:84-93):
    img_name.jpg x1,y1,x2,y2,class_id x1,y1,x2,y2,class_id ...
"""

from __future__ import annotations

from typing import List, Optional


def read_annotation_lines(annotation_path: str, test_size: Optional[float] = None,
                          random_seed: int = 5566):
    """Read annotation lines, optionally returning a seeded train/val split
    (reference utils.py:80-86, sklearn split with seed 5566)."""
    with open(annotation_path) as f:
        lines = f.readlines()
    if test_size:
        from sklearn.model_selection import train_test_split
        return train_test_split(lines, test_size=test_size,
                                random_state=random_seed)
    return lines


def read_txt_to_list(path: str) -> List[str]:
    """File -> stripped lines (reference utils.py:469-475)."""
    with open(path) as f:
        return [x.strip() for x in f.readlines()]


def parse_annotation_line(line: str):
    """One annotation line -> (img_name, [[x1,y1,x2,y2,cls], ...])."""
    parts = line.split()
    boxes = [[float(v) for v in b.split(",")] for b in parts[1:]]
    return parts[0], boxes
