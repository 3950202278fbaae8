"""Execute a Caffe deploy prototxt as a JAX program.

This is the parity backstop for the hand-transcribed architecture in
bn_inception.py: instead of trusting the transcription, construct the
forward graph directly from the reference deploy definition
(src/features_GPU_compute/models/ucf101/tsn_bn_inception_{rgb,flow}_deploy
.prototxt) and run it layer by layer. tests/test_nn.py asserts the two
produce identical embeddings for the same parameters, so any connectivity,
stride, padding or pooling-mode drift in the transcription is caught at the
output level, not just shape level.

Layer coverage is exactly what the TSN deploy nets use: Convolution, BN
(frozen — identity here because the converter folds it into the conv),
ReLU, Pooling (MAX/AVE with Caffe ceil-mode arithmetic), Concat, Dropout
(identity at test time, calcSig_wOF.py:44-46 runs caffe.TEST), InnerProduct.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp

from videoquery.nn import bn_inception
from videoquery.nn.prototxt import as_list, load_net


def _conv_param(layer: Mapping[str, Any]) -> tuple[int, int, int]:
    p = layer["convolution_param"]
    return (int(p.get("kernel_size", 1)), int(p.get("pad", 0)),
            int(p.get("stride", 1)))


def apply_prototxt(
    path: str,
    params: Mapping[str, Mapping[str, jax.Array]],
    x: jax.Array,                     # NHWC, preprocessed
    outputs: tuple[str, ...] = ("global_pool", "fc-action"),
) -> dict[str, jax.Array]:
    """Run the deploy net defined at `path` with BN-folded `params`.

    `params` is the same dict bn_inception.apply consumes (converter
    output); BN layers are identity because folding already happened.
    """
    net = load_net(path)
    blobs: dict[str, jax.Array] = {"data": x}

    def get(name):
        if name not in blobs:
            raise KeyError(f"prototxt references undefined blob {name!r}")
        return blobs[name]

    for layer in net["layer"]:
        typ = layer["type"]
        name = layer["name"]
        bottoms = as_list(layer.get("bottom"))
        tops = as_list(layer.get("top"))
        if typ == "Convolution":
            k, pad, stride = _conv_param(layer)
            y = bn_inception._conv(params, name, get(bottoms[0]), k, pad,
                                   stride, relu=False)
        elif typ == "BN":
            y = get(bottoms[0])  # frozen BN folded into the conv weights
        elif typ == "ReLU":
            y = jax.nn.relu(get(bottoms[0]))
        elif typ == "Pooling":
            p = layer["pooling_param"]
            k = int(p.get("kernel_size", 1))
            s = int(p.get("stride", 1))
            pad = int(p.get("pad", 0))
            pool = (bn_inception.max_pool if p.get("pool") == "MAX"
                    else bn_inception.avg_pool)
            y = pool(get(bottoms[0]), k, s, pad)
        elif typ == "Concat":
            y = jnp.concatenate([get(b) for b in bottoms], axis=-1)
        elif typ == "Dropout":
            y = get(bottoms[0])  # caffe.TEST: identity
        elif typ == "InnerProduct":
            h = get(bottoms[0])
            h = h.reshape(h.shape[0], -1).astype(jnp.float32)
            p = params[name]
            y = h @ p["w"].astype(jnp.float32) + p["b"].astype(jnp.float32)
        else:
            raise NotImplementedError(f"layer type {typ!r} ({name})")
        blobs[tops[0]] = y

    out = {}
    for want in outputs:
        y = blobs[want]
        if want == "global_pool":
            y = y.reshape(y.shape[0], -1).astype(jnp.float32)
        out[want] = y
    return out
