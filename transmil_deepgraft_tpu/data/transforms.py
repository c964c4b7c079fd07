"""Host-side image augmentation for histopathology tiles.

Equivalent of the reference's vendored ``datasets/utils/myTransforms.py``
extras - most notably **HEDJitter** (stain-space jitter via the Ruifrok-Johnston
H&E-DAB color deconvolution, ref ``myTransforms.py:1233``), plus flips,
90-degree rotations, gaussian blur and color jitter. All pure-numpy pure
functions of an explicit ``numpy.random.Generator``; applied on the host input
pipeline (the reference runs these in DataLoader workers). The 3x3 stain matrix
transform is trivially XLA-able for on-device augmentation when needed.
"""

from __future__ import annotations

import numpy as np

# Ruifrok & Johnston H&E-DAB stain matrix (rows: H, E, DAB) - the same constants
# scikit-image ships as rgb_from_hed.
RGB_FROM_HED = np.array(
    [
        [0.65, 0.70, 0.29],
        [0.07, 0.99, 0.11],
        [0.27, 0.57, 0.78],
    ],
    dtype=np.float64,
)
HED_FROM_RGB = np.linalg.inv(RGB_FROM_HED)


def rgb_to_hed(rgb: np.ndarray) -> np.ndarray:
    rgb = np.maximum(rgb.astype(np.float64) / 255.0, 1e-6)
    return (-np.log(rgb)) @ HED_FROM_RGB


def hed_to_rgb(hed: np.ndarray) -> np.ndarray:
    rgb = np.exp(-(hed @ RGB_FROM_HED))
    return np.clip(rgb * 255.0, 0, 255)


def hed_jitter(img: np.ndarray, theta: float, rng: np.random.Generator) -> np.ndarray:
    """Per-channel stain perturbation: s' = alpha * s + beta with
    alpha ~ U(1-theta, 1+theta), beta ~ U(-theta, theta) (ref HEDJitter)."""
    hed = rgb_to_hed(img)
    alpha = rng.uniform(1 - theta, 1 + theta, size=(1, 1, 3))
    beta = rng.uniform(-theta, theta, size=(1, 1, 3))
    return hed_to_rgb(hed * alpha + beta).astype(img.dtype)


def random_flip_rotate(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Random H/V flip + random multiple-of-90 rotation (ref AutoRandomRotation)."""
    if rng.random() < 0.5:
        img = img[:, ::-1]
    if rng.random() < 0.5:
        img = img[::-1]
    k = int(rng.integers(0, 4))
    return np.rot90(img, k, axes=(0, 1)).copy()


def random_gauss_blur(img: np.ndarray, rng: np.random.Generator, radius: tuple[float, float] = (0.5, 1.5), p: float = 0.5) -> np.ndarray:
    if rng.random() >= p:
        return img
    from scipy.ndimage import gaussian_filter

    sigma = rng.uniform(*radius)
    out = np.stack([gaussian_filter(img[..., c].astype(np.float64), sigma) for c in range(img.shape[-1])], -1)
    return out.astype(img.dtype)


def color_jitter(img: np.ndarray, rng: np.random.Generator, brightness: float = 0.2, contrast: float = 0.2) -> np.ndarray:
    out = img.astype(np.float64)
    out = out * rng.uniform(1 - brightness, 1 + brightness)
    mean = out.mean()
    out = (out - mean) * rng.uniform(1 - contrast, 1 + contrast) + mean
    return np.clip(out, 0, 255).astype(img.dtype)


def imagenet_normalize(img: np.ndarray) -> np.ndarray:
    """uint8 HWC -> float32 normalized (the reference's ToTensor+Normalize)."""
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return ((img.astype(np.float32) / 255.0) - mean) / std


def train_augment(img: np.ndarray, rng: np.random.Generator, hed_theta: float = 0.05) -> np.ndarray:
    """The classic-pipeline stain-augmentation stack
    (ref ``classic_jpg_dataloader.py:100-125``): color jitter + HED jitter +
    flips/rotations + gaussian blur."""
    img = color_jitter(img, rng)
    img = hed_jitter(img, hed_theta, rng)
    img = random_flip_rotate(img, rng)
    img = random_gauss_blur(img, rng)
    return img
