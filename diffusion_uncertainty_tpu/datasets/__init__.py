"""Folder-layout image datasets (PIL + numpy, framework-free).

Parity: reference ``dataset/imagenet.py`` (train/val/test with class-map
files), ``dataset/cifar10.py`` (class-name folders), ``lsun_churches256.py``
(flat webp folder). Returns dict records ``{'image': float32 [H,W,3] in
[0,1], 'label': int}`` like the reference's __getitem__.
"""

from .folder import (  # noqa: F401
    CIFAR10Dataset,
    ImageFolderDataset,
    ImagenetDataset,
    LSUNChurches256,
    NpzImagesDataset,
    SyntheticDataset,
)
