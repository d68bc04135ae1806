"""Random-access JPEG sources for the Grain host loader.

This is the real-data IO tier the reference got from tf.data's C++
``decode_and_crop_jpeg`` pipeline (reference: data/input_pipeline.py:109-117,
data/preprocess/preprocess.py:61-77). The TPU-native split is different: the
host does *only* JPEG decode to a fixed-shape uint8 frame (PIL/libjpeg-turbo,
with DCT-domain ``draft`` downscaling so large photos never decode at full
resolution), and every random transform — distorted-bbox crop, flip,
RandAugment, normalize, erasing, mixup — runs on the accelerator via
``sav_tpu.data.pipeline``. That keeps the host loop deterministic and cheap
(one core suffices for far more img/s than full TF-side augmentation) and
keeps jit shapes static.

Layout: ImageFolder convention, ``root/<class_name>/*.jpg``. Class indices
are the sorted class-directory order (what torchvision/TFDS ImageNet use).
"""

from __future__ import annotations

import io
import os
from typing import Sequence, Tuple

import numpy as np


def _list_jpegs(root: str) -> Tuple[Sequence[str], Sequence[int], Sequence[str]]:
    classes = sorted(
        d for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)))
    if not classes:
        raise FileNotFoundError(f'no class directories under {root!r}')
    paths, labels = [], []
    for idx, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        for fname in sorted(os.listdir(cdir)):
            if fname.lower().endswith(('.jpg', '.jpeg')):
                paths.append(os.path.join(cdir, fname))
                labels.append(idx)
    if not paths:
        raise FileNotFoundError(f'no .jpg/.jpeg files under {root!r}')
    return paths, labels, classes


def decode_jpeg_fixed(path_or_file, decode_size: int, *,
                      allow_native: bool = True) -> np.ndarray:
    """Decodes a JPEG to a fixed ``[decode_size, decode_size, 3]`` uint8 frame.

    Keep-aspect resize-small to ``decode_size`` then center crop — the same
    geometry as the reference's eval transform (preprocess.py:26-58), applied
    at decode time so downstream jit shapes are static. ``Image.draft`` asks
    libjpeg to decode at 1/2, 1/4, or 1/8 DCT scale when the target is much
    smaller than the stored photo, which skips most of the IDCT work for
    ImageNet-sized originals.

    When the native tier (``sav_tpu.native``: direct libjpeg with the same
    draft scaling, resize and crop fused into one C++ pass) is available it
    handles the common case; PIL remains the fallback for anything it
    declines (CMYK streams, missing toolchain — and ``SAV_TPU_NO_NATIVE=1``
    disables it outright).

    The device-side train transform then samples its distorted-bbox crop from
    this frame; relative to the reference (which crops the pre-resize
    original) only content outside the central square is lost.
    """
    from PIL import Image

    if allow_native:
        from sav_tpu import native

        if isinstance(path_or_file, (str, os.PathLike)):
            with open(path_or_file, 'rb') as f:
                data = f.read()
        else:
            data = path_or_file.read()
            path_or_file = io.BytesIO(data)  # rewound copy for the fallback
        frame = native.decode_jpeg_fixed_native(data, decode_size)
        if frame is not None:
            return frame
        if isinstance(path_or_file, (str, os.PathLike)):
            path_or_file = io.BytesIO(data)

    with Image.open(path_or_file) as img:
        # draft may overshoot (it only does power-of-two scales); ask for 2x
        # the target so the bilinear resize below still has headroom.
        img.draft('RGB', (decode_size * 2, decode_size * 2))
        return _resize_center_crop(img.convert('RGB'), decode_size)


def _resize_center_crop(img, decode_size: int) -> np.ndarray:
    """Keep-aspect resize-small + center crop of a PIL image -> uint8."""
    from PIL import Image

    width, height = img.size
    scale = decode_size / min(width, height)
    new_w = max(decode_size, int(round(width * scale)))
    new_h = max(decode_size, int(round(height * scale)))
    img = img.resize((new_w, new_h), Image.BILINEAR)
    x0 = (new_w - decode_size) // 2
    y0 = (new_h - decode_size) // 2
    img = img.crop((x0, y0, x0 + decode_size, y0 + decode_size))
    return np.asarray(img, dtype=np.uint8)


def resize_center_crop_array(array: np.ndarray, decode_size: int) -> np.ndarray:
    """Same geometry for an already-decoded uint8 array (e.g. TFDS records).

    Grayscale ``(H, W)`` / ``(H, W, 1)`` and RGBA records are converted to
    RGB so the output frame is always ``[decode_size, decode_size, 3]``.
    """
    from PIL import Image

    array = np.asarray(array)
    if array.ndim == 3 and array.shape[-1] == 1:
        array = array[..., 0]       # PIL wants 2-D for grayscale
    if (array.ndim == 3 and array.shape[-1] == 3
            and array.shape[:2] == (decode_size, decode_size)):
        return np.asarray(array, dtype=np.uint8)
    return _resize_center_crop(Image.fromarray(array).convert('RGB'),
                               decode_size)


class JpegFolderSource:
    """Random-access Grain source over ``root/<class>/*.jpg`` trees.

    ``__getitem__`` decodes on the calling (Grain worker) thread/process;
    records are ``{'image': uint8 [S, S, 3], 'label': int}``.
    """

    def __init__(self, root: str, decode_size: int = 256):
        self._root = os.path.abspath(root)
        self._decode_size = int(decode_size)
        self._paths, self._labels, self.class_names = _list_jpegs(self._root)

    def __repr__(self) -> str:
        # stable across instances: Grain validates checkpointed iterator
        # state against repr(data_source)
        return (f'JpegFolderSource({self._root!r}, n={len(self)}, '
                f'decode={self._decode_size})')

    def __len__(self) -> int:
        return len(self._paths)

    def __getitem__(self, index: int):
        image = decode_jpeg_fixed(self._paths[index], self._decode_size)
        return {'image': image, 'label': np.int64(self._labels[index])}


class JpegTarSource:
    """Random-access source over tar archives of ``<class>/<file>.jpg``
    entries (the ImageNet-21k-P distribution layout — the streaming
    converter in ``sav_tpu.data.imagenet21k`` shares it; reference:
    data/custom_datasets/imagenet_21k_p_winter.py:75-100).

    Builds a one-time member index per tar (name -> offset) so access stays
    O(1) per record. Reads use ``os.pread`` (atomic offset+read): Grain's
    reader pool calls ``__getitem__`` from many threads even with
    ``worker_count=0``, so a shared seek()+read() file object would
    interleave. Flat archives without class directories are rejected up
    front — labels would be silently meaningless.
    """

    def __init__(self, tar_paths: Sequence[str], decode_size: int = 256):
        import tarfile

        if isinstance(tar_paths, str):
            tar_paths = [tar_paths]
        self._tar_paths = [os.path.abspath(p) for p in sorted(tar_paths)]
        self._decode_size = int(decode_size)
        # (tar_index, data_offset, size, label); class names indexed globally
        entries = []
        class_names = set()
        per_tar_members = []
        for path in self._tar_paths:
            members = []
            with tarfile.open(path) as tar:
                for member in tar:
                    if not member.isfile():
                        continue
                    if not member.name.lower().endswith(('.jpg', '.jpeg')):
                        continue
                    # normalize `tar -C root .`-style ./ prefixes
                    name = member.name
                    while name.startswith('./'):
                        name = name[2:]
                    if '/' not in name:
                        raise ValueError(
                            f'{path!r}: entry {member.name!r} has no class '
                            f'directory; JpegTarSource derives labels from '
                            f'<class>/<file>.jpg paths')
                    cls = name.split('/')[0]
                    class_names.add(cls)
                    members.append((member.offset_data, member.size, cls))
            per_tar_members.append(members)
        self.class_names = sorted(class_names)
        cls_to_idx = {c: i for i, c in enumerate(self.class_names)}
        for tar_idx, members in enumerate(per_tar_members):
            for offset, size, cls in members:
                entries.append((tar_idx, offset, size, cls_to_idx[cls]))
        if not entries:
            raise FileNotFoundError(f'no jpegs in tars {self._tar_paths!r}')
        self._entries = entries
        self._fds = [None] * len(self._tar_paths)

    def __repr__(self) -> str:
        return (f'JpegTarSource({self._tar_paths!r}, n={len(self)}, '
                f'decode={self._decode_size})')

    def __len__(self) -> int:
        return len(self._entries)

    def _fd(self, tar_idx: int) -> int:
        fd = self._fds[tar_idx]
        if fd is None:
            # benign race: two threads may both open; one extra fd leaks
            # per tar at worst, reads are per-call positioned either way
            fd = os.open(self._tar_paths[tar_idx], os.O_RDONLY)
            self._fds[tar_idx] = fd
        return fd

    def __getitem__(self, index: int):
        import io

        tar_idx, offset, size, label = self._entries[index]
        payload = io.BytesIO(os.pread(self._fd(tar_idx), size, offset))
        image = decode_jpeg_fixed(payload, self._decode_size)
        return {'image': image, 'label': np.int64(label)}

    def __getstate__(self):
        state = dict(self.__dict__)
        state['_fds'] = [None] * len(self._tar_paths)  # fds don't pickle
        return state


class TfdsSource:
    """Random-access Grain source over a ``tfds.data_source`` split.

    TFDS's ArrayRecord reader gives index access without any tf.data graph
    (reference builds tf.data from ``tfds.builder``, data/input_pipeline.py:
    109-117); records route through the same fixed-frame decode as the JPEG
    sources. Module-level and picklable: Grain's worker pool pickles the
    data source into worker processes, so the ``tfds.data_source`` handle is
    dropped on pickle and reopened lazily per process.

    ``split=None`` means "the eval default": ``validation`` when the dataset
    has one, else ``test`` (many TFDS datasets — cifar10, mnist — only ship
    ``test``). An explicit split name is used verbatim.
    """

    def __init__(self, spec: str, split: str | None, decode_size: int):
        self._spec = spec
        self._decode_size = int(decode_size)
        import tensorflow_datasets as tfds

        if split is None or '[' not in split:
            source = tfds.data_source(spec)
            if split is None:
                split = 'validation' if 'validation' in source else 'test'
            if split not in source:
                raise ValueError(
                    f'tfds dataset {spec!r} has no split {split!r} '
                    f'(available: {sorted(source)}); pass '
                    f"'tfds:{spec},<split>' to pick one explicitly")
            self._split = split
            self._data = source[split]
        else:                       # sub-split string, e.g. 'train[:90%]'
            self._split = split
            self._data = tfds.data_source(spec, split=split)
        self._length = len(self._data)

    def _open(self):
        if self._data is None:      # reopened lazily after pickling
            import tensorflow_datasets as tfds
            if '[' in self._split:
                self._data = tfds.data_source(self._spec, split=self._split)
            else:
                self._data = tfds.data_source(self._spec)[self._split]
        return self._data

    def __repr__(self) -> str:
        return (f'TfdsSource({self._spec!r}, {self._split!r}, '
                f'n={len(self)}, decode={self._decode_size})')

    def __len__(self) -> int:
        return self._length

    def __getitem__(self, index: int):
        import io

        rec = self._open()[index]
        image = rec['image']
        if isinstance(image, bytes):    # SkipDecoding-style source
            image = decode_jpeg_fixed(io.BytesIO(image), self._decode_size)
        else:
            # variable-size decoded records -> fixed frame so downstream
            # jit shapes stay static
            image = resize_center_crop_array(image, self._decode_size)
        return {'image': image, 'label': np.int64(rec['label'])}

    def __getstate__(self):
        state = dict(self.__dict__)
        state['_data'] = None           # tfds handles don't pickle
        return state


def looks_like_jpeg_folder(path: str) -> bool:
    """True if ``path`` is an ImageFolder-style tree of JPEGs."""
    if not os.path.isdir(path):
        return False
    for entry in sorted(os.listdir(path)):
        sub = os.path.join(path, entry)
        if os.path.isdir(sub):
            for fname in os.listdir(sub):
                if fname.lower().endswith(('.jpg', '.jpeg')):
                    return True
    return False
