"""Synthesizes an imagenette-scale ImageFolder JPEG dataset.

No-egress stand-in for a real ImageNet subset: per-class structured images
(class-keyed gradient + textured shapes + photo-like noise), saved as
quality-85 JPEGs at varied original resolutions (256-512 px) so the loader's
draft-mode decode, resize-small, and crop paths are all exercised at
realistic decode cost. Labels are recoverable from the dominant hue, so a
model genuinely can fit this data.

Usage:
    python scripts/make_jpeg_dataset.py --out /tmp/jpeg_imagenette \
        --classes 10 --per-class 100 [--tar]
"""

import argparse
import os
import tarfile

import numpy as np


def synth_image(rng: np.random.RandomState, cls: int, num_classes: int,
                height: int, width: int) -> np.ndarray:
    hue = 2 * np.pi * cls / num_classes
    base = np.stack([
        0.5 + 0.45 * np.cos(hue),
        0.5 + 0.45 * np.cos(hue + 2 * np.pi / 3),
        0.5 + 0.45 * np.cos(hue + 4 * np.pi / 3),
    ])
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    yy, xx = yy / height, xx / width
    angle = rng.uniform(0, 2 * np.pi)
    grad = (np.cos(angle) * xx + np.sin(angle) * yy)[..., None]
    img = base * (0.55 + 0.45 * grad)

    for _ in range(rng.randint(3, 8)):          # textured blobs
        cy, cx = rng.uniform(0, 1, 2)
        radius = rng.uniform(0.05, 0.25)
        mask = ((yy - cy) ** 2 + (xx - cx) ** 2) < radius ** 2
        color = base * rng.uniform(0.4, 1.4, 3)
        img[mask] = np.clip(color * rng.uniform(0.5, 1.2), 0, 1)

    img += rng.normal(0, 0.03, img.shape)       # sensor-ish noise
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def main():
    from PIL import Image

    import io

    parser = argparse.ArgumentParser()
    parser.add_argument('--out', required=True)
    parser.add_argument('--classes', type=int, default=10)
    parser.add_argument('--per-class', type=int, default=100)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--quality', type=int, default=85)
    parser.add_argument('--min-size', type=int, default=256)
    parser.add_argument('--max-size', type=int, default=512)
    parser.add_argument('--tar', action='store_true',
                        help='also pack the tree into shards.tar')
    parser.add_argument('--tar-only', type=int, default=0, metavar='N',
                        help='write N tar shards directly (classes round-'
                             'robined across shards), no ImageFolder tree — '
                             'the layout for scale soaks where 10^5 inodes '
                             'would be wasteful')
    args = parser.parse_args()

    rng = np.random.RandomState(args.seed)

    if args.tar_only:
        os.makedirs(args.out, exist_ok=True)
        tars = [tarfile.open(os.path.join(args.out, f'shard_{s:03d}.tar'),
                             'w') for s in range(args.tar_only)]
        total = 0
        for cls in range(args.classes):
            cname = f'class_{cls:04d}'
            for i in range(args.per_class):
                height = int(rng.randint(args.min_size, args.max_size + 1))
                width = int(rng.randint(args.min_size, args.max_size + 1))
                arr = synth_image(rng, cls, args.classes, height, width)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format='JPEG',
                                          quality=args.quality)
                data = buf.getvalue()
                info = tarfile.TarInfo(f'{cname}/img_{i:05d}.jpg')
                info.size = len(data)
                tars[(cls * args.per_class + i) % len(tars)].addfile(
                    info, io.BytesIO(data))
                total += 1
            if cls % 10 == 0:
                print(f'class {cls}/{args.classes} done '
                      f'({total} images)', flush=True)
        for tar in tars:
            tar.close()
        print(f'wrote {total} jpegs into {args.tar_only} tar shards '
              f'under {args.out}')
        return

    for cls in range(args.classes):
        cdir = os.path.join(args.out, f'class_{cls:04d}')
        os.makedirs(cdir, exist_ok=True)
        for i in range(args.per_class):
            height = int(rng.randint(args.min_size, args.max_size + 1))
            width = int(rng.randint(args.min_size, args.max_size + 1))
            arr = synth_image(rng, cls, args.classes, height, width)
            Image.fromarray(arr).save(
                os.path.join(cdir, f'img_{i:05d}.jpg'),
                quality=args.quality)
    total = args.classes * args.per_class
    print(f'wrote {total} jpegs under {args.out}')

    if args.tar:
        tar_path = os.path.join(args.out, 'shards.tar')
        with tarfile.open(tar_path, 'w') as tar:
            for cls in range(args.classes):
                cname = f'class_{cls:04d}'
                cdir = os.path.join(args.out, cname)
                for fname in sorted(os.listdir(cdir)):
                    tar.add(os.path.join(cdir, fname),
                            arcname=f'{cname}/{fname}')
        print(f'wrote {tar_path}')


if __name__ == '__main__':
    main()
