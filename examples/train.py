"""Fine-tuning demo (mirror of the reference train notebook: BCCD-style flow).

Usage:
    python examples/train.py --anno anno.txt --classes classes.txt \
        --imgdir imgs/ [--val-anno anno-val.txt] [--epochs 100] \
        [--devices 8] [--bf16] [--mosaic] [--ckpt ckpts/]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--anno", required=True)
    ap.add_argument("--val-anno", default=None)
    ap.add_argument("--classes", required=True)
    ap.add_argument("--imgdir", required=True)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8, help="per-device batch")
    ap.add_argument("--devices", type=int, default=1)
    ap.add_argument("--weights", default=None,
                    help="init from darknet .weights / .npz (else random)")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--mosaic", action="store_true")
    ap.add_argument("--hflip", action="store_true")
    ap.add_argument("--jitter", action="store_true", help="HSV color jitter")
    ap.add_argument("--letterbox", action="store_true")
    ap.add_argument("--multi-scale", nargs=2, type=int, default=None,
                    metavar=("LO", "HI"),
                    help="random square train size in [LO, HI] step 32")
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient accumulation micro-steps")
    ap.add_argument("--smooth", type=float, default=0.0)
    ap.add_argument("--encode-on-device", action="store_true",
                    help="scatter label grids on the accelerator inside the "
                         "jitted step (host ships raw box tables)")
    ap.add_argument("--no-bn-stats-grad", action="store_true",
                    help="stop gradients through BN batch stats: ~+6-11%% "
                         "step throughput, NOT reference BN math")
    ap.add_argument("--pallas-wgrad", action="store_true",
                    help="Pallas 3x3 weight-gradient kernel in the "
                         "backward (ops/wgrad_pallas.py)")
    ap.add_argument("--ckpt", default=None, help="checkpoint dir")
    ap.add_argument("--out", default="final.npz",
                    help="final checkpoint path")
    ap.add_argument("--img-size", type=int, default=416,
                    help="square input size (any /32-divisible value)")
    args = ap.parse_args()

    from yolov4tpu import Yolov4, YoloConfig
    from yolov4tpu.callbacks import CheckpointCallback
    from yolov4tpu.data.pipeline import DataGenerator
    from yolov4tpu.utils.io import read_annotation_lines

    cfg = YoloConfig(img_size=(args.img_size, args.img_size, 3),
                     batch_size=args.batch, num_devices=args.devices,
                     compute_dtype="bfloat16" if args.bf16 else "float32",
                     use_mosaic=args.mosaic, label_smoothing=args.smooth,
                     use_hflip=args.hflip, use_color_jitter=args.jitter,
                     letterbox=args.letterbox,
                     multi_scale=(tuple(args.multi_scale)
                                  if args.multi_scale else None),
                     grad_accum_steps=args.accum,
                     encode_on_device=args.encode_on_device,
                     bn_stats_gradient=not args.no_bn_stats_grad,
                     pallas_wgrad=args.pallas_wgrad)

    train_lines = read_annotation_lines(args.anno)
    val_lines = (read_annotation_lines(args.val_anno)
                 if args.val_anno else None)
    train_gen = DataGenerator(train_lines, args.classes, args.imgdir,
                              config=cfg)
    val_gen = (DataGenerator(val_lines, args.classes, args.imgdir, config=cfg,
                             shuffle=False) if val_lines else None)

    model = Yolov4(weight_path=args.weights, class_name_path=args.classes,
                   config=cfg)
    callbacks = []
    if args.ckpt:
        callbacks.append(CheckpointCallback(args.ckpt + "/epoch{epoch}.npz"))
    model.fit(train_gen, epochs=args.epochs, val_data_gen=val_gen,
              callbacks=callbacks)
    model.save_model(args.out)


if __name__ == "__main__":
    main()
