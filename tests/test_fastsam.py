"""FastSAM-class segmenter (models/fastsam.py): graph shapes, DFL box
decode, NMS, and everything-prompt mask composition."""

import numpy as np
import jax
import jax.numpy as jnp

from vings_mono_tpu.models.fastsam import (FastSAM, REG_MAX, decode_boxes,
                                           _nms, segment_everything)


def test_fastsam_shapes():
    model = FastSAM()
    x = jnp.zeros((1, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    preds, proto = model.apply(params, x)
    assert len(preds) == 3
    assert preds[0].shape[1:3] == (8, 12)      # stride 8
    assert preds[1].shape[1:3] == (4, 6)       # stride 16
    assert preds[2].shape[1:3] == (2, 3)       # stride 32
    assert preds[0].shape[-1] == 4 * REG_MAX + 1 + 32
    assert proto.shape == (1, 16, 24, 32)   # stride-4 protos


def test_decode_boxes_dfl():
    """A one-hot DFL distribution decodes to the exact bin distance."""
    B, h, w = 1, 4, 4
    pred = np.zeros((B, h, w, 4 * REG_MAX + 1 + 32), np.float32)
    box = np.full((4, REG_MAX), -20.0, np.float32)
    for side, k in enumerate([2, 3, 4, 5]):
        box[side, k] = 20.0                      # one-hot at distance k
    pred[..., :4 * REG_MAX] = box.reshape(-1)
    boxes, scores, coeffs = decode_boxes(jnp.asarray(pred), stride=8)
    b = np.asarray(boxes)[0, 0]                  # cell (0,0), center 0.5
    np.testing.assert_allclose(b, [(0.5 - 2) * 8, (0.5 - 3) * 8,
                                   (0.5 + 4) * 8, (0.5 + 5) * 8], atol=1e-4)
    assert coeffs.shape == (1, 16, 32)


def test_nms_suppresses_overlaps():
    boxes = np.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                       np.float32)
    scores = np.asarray([0.9, 0.8, 0.7], np.float32)
    keep = _nms(boxes, scores, iou_thresh=0.5)
    assert list(keep) == [0, 2]


def test_segment_everything_runs_random_weights():
    """everything_prompt mechanics on random weights: returns a (possibly
    empty) list of (H, W) bool masks without error."""
    model = FastSAM()
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    masks = segment_everything(model, params, rgb, conf=0.01)
    for m in masks:
        assert m.shape == (48, 64) and m.dtype == bool
