"""Top-level tracker — the TPU `DBAFusion`
(/root/reference/scripts/frontend/dbaf.py): owns the DroidNet weights, the
keyframe video, the motion filter, and the frontend; exposes `track()` and
the save-buffer surface the middleware/looper read."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.droid_net import DroidNet, load_droid_weights
from .frontend import Frontend
from .graph import CovisibleGraph
from .motion_filter import MotionFilter
from .video import DepthVideo


class Tracker:
    def __init__(self, cfg, height, width, params=None, weights_path=None):
        self.cfg = cfg
        self.model = DroidNet()
        if params is None and weights_path is not None:
            params = load_droid_weights(weights_path)
        if params is None:
            params = self._random_params(height, width)
        self.params = params

        # stable apply-fn identities (jit static args)
        model = self.model
        self.fnet_apply = _FnetApply(model)
        self.cnet_apply = _CnetApply(model)
        self.update_apply = _UpdateApply(model)

        self.video = DepthVideo(cfg, height, width)
        self.graph = CovisibleGraph(self.video, self.update_apply,
                                    self.params, cfg)
        self.filter = MotionFilter(
            self.params,
            (self.fnet_apply, self.cnet_apply, self.update_apply),
            self.video, thresh=float(cfg["frontend"]["filter_thresh"]),
            bf16=bool(cfg["frontend"].get("bf16_gru", True)))
        self.frontend = Frontend(self.video, self.graph, cfg)
        self.local_to_global_bias = 0

    def _random_params(self, height, width):
        h, w = height // 8, width // 8
        rng = jax.random.PRNGKey(0)
        img = jnp.zeros((1, 64, 64, 3))
        fvars = self.model.init(rng, img, method=DroidNet.extract_features)
        uvars = self.model.init(
            rng, jnp.zeros((1, h, w, 128)), jnp.zeros((1, h, w, 128)),
            jnp.zeros((1, h, w, 196)), None, jnp.zeros((1,), jnp.int32),
            2, True, method=DroidNet.run_update)
        params = {**fvars["params"], **uvars["params"]}
        return {"params": params}

    def track(self, data_packet):
        """data_packet: {'timestamp', 'rgb' (H,W,3) f32 [0,1],
        'intrinsic' [fx,fy,cx,cy], optional 'depth' (H,W) metric}."""
        ts = float(data_packet["timestamp"])
        rgb = data_packet["rgb"]
        if getattr(rgb, "dtype", None) == np.uint8:
            # upload the 8-bit frame and convert on device: the h2d image
            # transfer is a per-frame serial cost (4x smaller as uint8)
            rgb = jnp.asarray(rgb).astype(jnp.float32) / 255.0
        else:
            rgb = jnp.asarray(rgb, jnp.float32)
        intr = jnp.asarray(data_packet["intrinsic"], jnp.float32)
        depth = data_packet.get("depth")
        if depth is not None:
            depth = jnp.asarray(depth, jnp.float32)
        self.filter.track(ts, rgb, depth, intr)
        self.frontend()

    @property
    def new_frame_added(self):
        return self.frontend.new_frame_added


class _FnetApply:
    def __init__(self, model):
        self.model = model

    def __call__(self, params, img):
        return self.model.apply(params, img,
                                method=lambda m, x: m.fnet(x))

    def __hash__(self):
        return hash(("fnet", id(self.model)))

    def __eq__(self, other):
        return isinstance(other, _FnetApply) and other.model is self.model


class _CnetApply:
    def __init__(self, model):
        self.model = model

    def __call__(self, params, img):
        ni = self.model.apply(params, img, method=lambda m, x: m.cnet(x))
        net, inp = jnp.split(ni, 2, axis=-1)
        return jnp.tanh(net), jax.nn.relu(inp)

    def __hash__(self):
        return hash(("cnet", id(self.model)))

    def __eq__(self, other):
        return isinstance(other, _CnetApply) and other.model is self.model


class _UpdateApply:
    def __init__(self, model):
        self.model = model

    def __call__(self, params, net, inp, corr, flow, ii, num_frames,
                 upsample):
        return self.model.apply(
            params, net, inp, corr, flow, ii, num_frames, upsample,
            method=lambda m, *a: m.update(*a))

    def __hash__(self):
        return hash(("update", id(self.model)))

    def __eq__(self, other):
        return isinstance(other, _UpdateApply) and other.model is self.model
