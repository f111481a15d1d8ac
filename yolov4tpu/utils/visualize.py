"""Detection post-processing to DataFrame + drawing (reference utils.py:56-118)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def get_detection_data(img, model_outputs, class_names,
                       letterbox_transform=None):
    """Model NMS outputs -> pandas DataFrame (reference utils.py:56-78).

    model_outputs: (boxes, scores, classes, valid_detections) batched arrays;
    entry 0 of the batch is used.  Boxes are normalised [0,1]; they are scaled
    to the raw image's size.  Column contract matches the reference exactly:
    [x1, y1, x2, y2, class_name, score, w, h].

    letterbox_transform: ((scale, dx, dy), (model_h, model_w)) when the image
    was letterboxed — boxes are then unpadded/unscaled back to raw coords
    instead of plain stretching.
    """
    num_bboxes = int(np.asarray(model_outputs[-1])[0])
    boxes, scores, classes = [np.asarray(o)[0][:num_bboxes]
                              for o in model_outputs[:-1]]

    h, w = img.shape[:2]
    if letterbox_transform is not None:
        from ..data.pipeline import letterbox_unmap
        transform, model_hw = letterbox_transform
        boxes = letterbox_unmap(boxes, transform, model_hw, (h, w))
        df = pd.DataFrame(boxes.astype("int64"),
                          columns=["x1", "y1", "x2", "y2"])
    else:
        df = pd.DataFrame(boxes, columns=["x1", "y1", "x2", "y2"])
        df[["x1", "x2"]] = (df[["x1", "x2"]] * w).astype("int64")
        df[["y1", "y2"]] = (df[["y1", "y2"]] * h).astype("int64")
    df["class_name"] = np.array(class_names)[classes.astype("int64")]
    df["score"] = scores
    df["w"] = df["x2"] - df["x1"]
    df["h"] = df["y2"] - df["y1"]
    return df


def draw_bbox(img, detections, cmap, random_color=True, figsize=(10, 10),
              show_img=True, show_text=True):
    """Draw detection boxes + labels on an image (reference utils.py:88-118)."""
    import cv2

    img = np.array(img)
    scale = max(img.shape[0:2]) / 416
    line_width = int(2 * scale)

    for _, row in detections.iterrows():
        x1, y1, x2, y2, cls, score, w, h = row.values
        color = (list(np.random.random(size=3) * 255)
                 if random_color else cmap[cls])
        cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)), color,
                      line_width)
        if show_text:
            text = f"{cls} {score:.2f}"
            font = cv2.FONT_HERSHEY_DUPLEX
            font_scale = max(0.3 * scale, 0.3)
            thickness = max(int(1 * scale), 1)
            (tw, th) = cv2.getTextSize(text, font, fontScale=font_scale,
                                       thickness=thickness)[0]
            cv2.rectangle(img, (int(x1) - line_width // 2, int(y1) - th),
                          (int(x1) + tw, int(y1)), color, cv2.FILLED)
            cv2.putText(img, text, (int(x1), int(y1)), font, font_scale,
                        (255, 255, 255), thickness, cv2.LINE_AA)
    if show_img:
        import matplotlib.pyplot as plt
        plt.figure(figsize=figsize)
        plt.imshow(img)
        plt.show()
    return img
