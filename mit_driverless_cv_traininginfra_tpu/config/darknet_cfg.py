"""Darknet ``.cfg`` ingestion → typed, hashable network spec.

Capability parity with the reference cfg system
(``CVC-YOLOv3/utils/parse_config.py:1-18`` and the ``[net]``-block experiment
config consumed by ``CVC-YOLOv3/models.py:225-310``), re-designed so the spec
is a frozen dataclass usable as a static argument to ``jax.jit``: the whole
graph topology is compile-time constant, which is what lets XLA see one flat
program (no Python dispatch at trace time).

The reference reads anchors out of *row 1 of the training CSV*
(``models.py:28-36``) with a fallback to the hardcoded vanilla COCO anchors
(``models.py:13``); both channels are reproduced here.
"""

from __future__ import annotations

import csv
import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

# COCO anchors at 416-scale, (w, h) pairs — mirrors the semantics of the
# reference's fallback list (models.py:13).
VANILLA_ANCHORS: Tuple[Tuple[float, float], ...] = (
    (10, 13), (16, 30), (33, 23),
    (30, 61), (62, 45), (59, 119),
    (116, 90), (156, 198), (373, 326),
)


def parse_model_config(path: str) -> List[Dict[str, str]]:
    """Parse a Darknet-style ``.cfg`` into an ordered list of block dicts.

    Behavioural parity with ``utils/parse_config.py:1-18``: blocks open with
    ``[type]``; comment lines start with ``#``; ``key=value`` pairs are
    stripped strings; ``convolutional`` blocks get a default
    ``batch_normalize=0`` entry.
    """
    with open(path, "r") as f:
        raw_lines = f.read().split("\n")
    lines = [ln.strip() for ln in raw_lines if ln and not ln.startswith("#")]
    module_defs: List[Dict[str, str]] = []
    for line in lines:
        if line.startswith("["):
            module_defs.append({"type": line[1:-1].rstrip()})
            if module_defs[-1]["type"] == "convolutional":
                module_defs[-1]["batch_normalize"] = "0"
        else:
            key, value = line.split("=", 1)
            module_defs[-1][key.rstrip()] = value.strip()
    return module_defs


def read_anchors_csv(csv_path: str) -> List[Tuple[float, float]]:
    """Read anchors from row 1 of a training CSV.

    The reference (``models.py:28-36``) stringifies the csv row and splits on
    ``'|'``; the serialized format (written by the k-means generator) is
    ``"w,h|w,h|..."`` in the first cell. We parse the first cell directly,
    which accepts the same files.
    """
    with open(csv_path) as f:
        row = next(csv.reader(f))
    cell = str(row)[2:-2].split("'")[0]
    pairs = [tuple(float(v) for v in chunk.split(",")) for chunk in cell.split("|")]
    if any(len(p) != 2 for p in pairs):
        raise ValueError(f"Malformed anchor row in {csv_path!r}: {row!r}")
    return [(p[0], p[1]) for p in pairs]


@dataclasses.dataclass(frozen=True)
class ConvBlock:
    filters: int          # output channels (resolved, incl. preyolo width)
    size: int
    stride: int
    batch_normalize: bool
    activation: str       # 'leaky' | 'ReLU' | 'linear'
    is_preyolo: bool = False


@dataclasses.dataclass(frozen=True)
class MaxPoolBlock:
    size: int
    stride: int


@dataclasses.dataclass(frozen=True)
class UpsampleBlock:
    stride: int


@dataclasses.dataclass(frozen=True)
class RouteBlock:
    layers: Tuple[int, ...]  # already normalised to absolute block indices


@dataclasses.dataclass(frozen=True)
class ShortcutBlock:
    from_layer: int  # relative (negative) index, as in the cfg


@dataclasses.dataclass(frozen=True)
class YoloBlock:
    anchors: Tuple[Tuple[float, float], ...]  # (w, h) for this head's mask
    mask: Tuple[int, ...]


Block = object  # union of the above, kept loose for pytree friendliness


@dataclasses.dataclass(frozen=True)
class NetConfig:
    """The ``[net]`` block, which the reference doubles as experiment config
    (``model_cfg/yolo_baseline.cfg:1-20``, accessors ``models.py:230-310``)."""

    width: int
    height: int
    onnx_height: int
    num_classes: int
    channels: int
    yolo_masks: Tuple[Tuple[int, ...], ...]
    yolo_scales: Tuple[int, ...]
    validate_uri: str
    train_uri: str
    weights_uri: str
    start_weights_dim: Tuple[int, ...]
    num_train_images: int
    num_validate_images: int
    leaky_slope: float
    conv_activation: str
    build_targets_ignore_thresh: float
    conf_thresh: float
    nms_thresh: float
    iou_thresh: float

    @property
    def bw(self) -> bool:
        return self.channels == 1

    def onnx_name(self, config_path: str) -> str:
        stem = os.path.basename(config_path).split(".")[0]
        return f"{stem}_{self.width}{self.onnx_height}.onnx"


@dataclasses.dataclass(frozen=True)
class NetworkSpec:
    """Full compile-time description of a Darknet graph.

    ``blocks`` excludes the ``[net]`` block; indices match the reference's
    ``module_list`` so ``route``/``shortcut`` offsets and the weight-file
    walking order line up exactly (``models.py:312-338,339-422``).
    """

    net: NetConfig
    blocks: Tuple[Block, ...]
    anchors: Tuple[Tuple[float, float], ...]  # the full 9-anchor list

    @property
    def out_channels(self) -> Tuple[int, ...]:
        """Output channel count after each block (input channels first)."""
        chans = [self.net.channels]
        for b in self.blocks:
            if isinstance(b, ConvBlock):
                c = b.filters
            elif isinstance(b, RouteBlock):
                # positive indices address block li's output, which lives at
                # chans[li + 1] because chans[0] is the network input
                # (reference: models.py:93-96 shifts positive indices by +1).
                c = sum(chans[li + 1] if li > 0 else chans[li] for li in b.layers)
            elif isinstance(b, ShortcutBlock):
                c = chans[b.from_layer]
            else:
                c = chans[-1]
            chans.append(c)
        return tuple(chans)


def _resolve_route_indices(layers_str: str) -> Tuple[int, ...]:
    """Reference quirk (``models.py:90-96``): positive route indices are
    shifted by +1 relative to the module list when computing channel counts,
    because ``output_filters`` holds the input channels at slot 0. Runtime
    routing (``models.py:322-324``) uses the raw indices against
    ``layer_outputs``. We keep the raw indices and reproduce the channel
    arithmetic in ``NetworkSpec.out_channels`` by the same convention."""
    return tuple(int(x) for x in layers_str.split(","))


def load_network_spec(
    config_path: str,
    vanilla_anchor: bool = False,
    anchors_override: Optional[Sequence[Tuple[float, float]]] = None,
) -> NetworkSpec:
    """Parse cfg + anchor channel into a :class:`NetworkSpec`.

    ``anchors_override`` short-circuits the CSV read (useful for tests and
    for serving where no training CSV exists).
    """
    module_defs = parse_model_config(config_path)
    hp = module_defs.pop(0)
    assert hp["type"] == "net", f"first block must be [net], got {hp['type']}"

    yolo_masks = tuple(
        tuple(int(y) for y in x.split(",")) for x in hp["yolo_masks"].split("|")
    )
    net = NetConfig(
        width=int(hp["width"]),
        height=int(hp["height"]),
        onnx_height=int(hp.get("onnx_height", hp["height"])),
        num_classes=int(hp["classes"]),
        channels=int(hp["channels"]),
        yolo_masks=yolo_masks,
        yolo_scales=tuple(int(s) for s in hp["yolo_scales"].split(",")),
        validate_uri=hp.get("validate_uri", ""),
        train_uri=hp.get("train_uri", ""),
        weights_uri=hp.get("weights_uri", ""),
        start_weights_dim=tuple(int(x) for x in hp["start_weights_dim"].split(","))
        if "start_weights_dim" in hp
        else (),
        num_train_images=int(hp.get("num_train_images", -1)),
        num_validate_images=int(hp.get("num_validate_images", -1)),
        leaky_slope=float(hp.get("leaky_slope", 0.1)),
        conv_activation=hp.get("conv_activation", "leaky"),
        build_targets_ignore_thresh=float(hp.get("build_targets_ignore_thresh", 0.5)),
        conf_thresh=float(hp.get("conf_thresh", 0.8)),
        nms_thresh=float(hp.get("nms_thresh", 0.25)),
        iou_thresh=float(hp.get("iou_thresh", 0.5)),
    )

    if anchors_override is not None:
        anchor_list = [tuple(a) for a in anchors_override]
    elif vanilla_anchor or not net.train_uri or not os.path.exists(net.train_uri):
        anchor_list = list(VANILLA_ANCHORS)
    else:
        try:
            anchor_list = read_anchors_csv(net.train_uri)
        except ValueError:
            import warnings

            warnings.warn(
                f"Row 1 of {net.train_uri!r} holds no anchors; falling back "
                "to the vanilla anchor list (pass vanilla_anchor=True or run "
                "the k-means generator to silence this)."
            )
            anchor_list = list(VANILLA_ANCHORS)

    blocks: List[Block] = []
    yolo_count = 0
    # pre-yolo convs are linear + no BN (models.py:51-54)
    for md in module_defs:
        t = md["type"]
        if t == "convolutional":
            is_preyolo = md["filters"] == "preyolo"
            if is_preyolo:
                filters = (net.num_classes + 5) * len(yolo_masks[yolo_count])
            else:
                filters = int(md["filters"])
            blocks.append(
                ConvBlock(
                    filters=filters,
                    size=int(md["size"]),
                    stride=int(md["stride"]),
                    batch_normalize=not is_preyolo,
                    activation="linear" if is_preyolo else net.conv_activation,
                    is_preyolo=is_preyolo,
                )
            )
        elif t == "maxpool":
            blocks.append(MaxPoolBlock(size=int(md["size"]), stride=int(md["stride"])))
        elif t == "upsample":
            blocks.append(UpsampleBlock(stride=int(md["stride"])))
        elif t == "route":
            blocks.append(RouteBlock(layers=_resolve_route_indices(md["layers"])))
        elif t == "shortcut":
            blocks.append(ShortcutBlock(from_layer=int(md["from"])))
        elif t == "yolo":
            mask = yolo_masks[yolo_count]
            blocks.append(
                YoloBlock(
                    anchors=tuple(tuple(anchor_list[i]) for i in mask),
                    mask=mask,
                )
            )
            yolo_count += 1
        else:
            raise ValueError(f"Unknown block type {t!r} in {config_path}")

    return NetworkSpec(net=net, blocks=tuple(blocks), anchors=tuple(tuple(a) for a in anchor_list))
