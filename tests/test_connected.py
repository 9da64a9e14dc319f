"""Connected-components op vs a host union-find-style reference."""

import jax.numpy as jnp
import numpy as np

from basi_tpu.ops.connected import extract_instances, label_components


def _np_components(binary):
    """Simple BFS labeling for the oracle."""
    h, w = binary.shape
    labels = -np.ones((h, w), np.int64)
    cur = 0
    for sy in range(h):
        for sx in range(w):
            if binary[sy, sx] and labels[sy, sx] < 0:
                stack = [(sy, sx)]
                labels[sy, sx] = cur
                while stack:
                    y, x = stack.pop()
                    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        ny, nx = y + dy, x + dx
                        if (0 <= ny < h and 0 <= nx < w and binary[ny, nx]
                                and labels[ny, nx] < 0):
                            labels[ny, nx] = cur
                            stack.append((ny, nx))
                cur += 1
    return labels, cur


def test_labels_match_bfs(rng):
    binary = (rng.rand(40, 40) > 0.7).astype(np.float32)
    got = np.asarray(label_components(jnp.asarray(binary)))
    want, n = _np_components(binary > 0.5)
    # same partition: bijection between label sets
    assert (got >= 0).sum() == (want >= 0).sum()
    mapping = {}
    for g, w_ in zip(got.ravel(), want.ravel()):
        if w_ < 0:
            assert g < 0
            continue
        if w_ in mapping:
            assert mapping[w_] == g
        else:
            mapping[w_] = g
    assert len(mapping) == n
    assert len(set(mapping.values())) == n


def test_extract_instances_blobs():
    sal = np.zeros((64, 64), np.float32)
    sal[5:20, 5:20] = 0.9    # area 225
    sal[40:60, 40:60] = 0.8  # area 400
    sal[30, 2] = 0.99        # speck below min_area
    masks, scores = extract_instances(jnp.asarray(sal), num_slots=4,
                                      min_area=16)
    masks = np.asarray(masks)
    scores = np.asarray(scores)
    assert (scores > 0).sum() == 2
    # biggest first
    assert masks[0].sum() == 400 and abs(scores[0] - 0.8) < 1e-5
    assert masks[1].sum() == 225 and abs(scores[1] - 0.9) < 1e-5
    assert masks[2].sum() == 0


def test_snake_component():
    """A long snake needs many propagation iterations — must still converge."""
    b = np.zeros((32, 32), np.float32)
    for i in range(0, 32, 2):
        b[i, :] = 1
        if (i // 2) % 2 == 0:
            b[min(i + 1, 31), -1] = 1
        else:
            b[min(i + 1, 31), 0] = 1
    got = np.asarray(label_components(jnp.asarray(b)))
    want, n = _np_components(b > 0.5)
    assert n == 1
    labs = set(got[got >= 0].ravel().tolist())
    assert len(labs) == 1
