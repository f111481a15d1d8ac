from .io import (parse_annotation_line, read_annotation_lines,  # noqa: F401
                 read_txt_to_list)
from .visualize import draw_bbox, get_detection_data  # noqa: F401
