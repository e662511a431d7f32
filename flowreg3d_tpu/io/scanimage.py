"""ScanImage TIFF metadata parsing.

Parity target: reference util/io/_scanimage.py — extract channel/volume/
slice/frame-rate structure from ScanImage's key-value header
(``SI.<group>.<field> = <value>`` lines stored in the TIFF
ImageDescription/Software tags) and interpret it as volumetric dimensions.
"""

import ast
import re


def _parse_value(text):
    text = text.strip()
    if text in ("true", "false"):
        return text == "true"
    # MATLAB-style arrays: [1;2], [1 2 3]
    if text.startswith("[") and text.endswith("]"):
        inner = text[1:-1].replace(";", " ").replace(",", " ")
        parts = inner.split()
        try:
            return [_parse_value(p) for p in parts]
        except ValueError:
            return text
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        return text


def parse_scanimage_header(text):
    """``SI.x.y = v`` lines -> nested dict under key path x.y."""
    out = {}
    for line in text.splitlines():
        m = re.match(r"\s*(SI\.[\w.\[\]]+)\s*=\s*(.+)", line)
        if not m:
            continue
        out[m.group(1)] = _parse_value(m.group(2))
    return out


def parse_scanimage_metadata(source):
    """Structured metadata from a TIFF path or raw header text.

    Returns None when no ScanImage header is present; else a dict with
    channels / slices_per_volume / frames_per_slice / num_volumes /
    frame_rate / z_step / is_scanimage.
    """
    import os

    if isinstance(source, str) and "SI." not in source \
            and os.path.isfile(source):
        from flowreg3d_tpu.io._tiff_format import TiffReader

        with TiffReader(source) as tr:
            text = tr.pages[0].description if tr.pages else ""
            n_pages = tr.n_pages
    else:
        text = source
        n_pages = None

    fields = parse_scanimage_header(text or "")
    if not fields:
        return None

    def get(*names, default=None):
        for n in names:
            if n in fields:
                return fields[n]
        return default

    save = get("SI.hChannels.channelSave", default=1)
    if isinstance(save, (list, tuple)):
        channels = len(save)
    else:
        channels = 1

    slices = get("SI.hStackManager.numSlices",
                 "SI.hStackManager.actualNumSlices", default=1)
    frames_per_slice = get("SI.hStackManager.framesPerSlice", default=1)
    num_volumes = get("SI.hStackManager.numVolumes",
                      "SI.hStackManager.actualNumVolumes", default=None)
    z_step = get("SI.hStackManager.stackZStepSize", default=None)
    frame_rate = get("SI.hRoiManager.scanFrameRate", default=None)
    volume_rate = get("SI.hRoiManager.scanVolumeRate", default=None)

    meta = {
        "is_scanimage": True,
        "channels": int(channels),
        "slices_per_volume": int(slices) if slices else 1,
        "frames_per_slice": int(frames_per_slice) if frames_per_slice else 1,
        "num_volumes": int(num_volumes) if num_volumes else None,
        "z_step": z_step,
        "frame_rate": frame_rate,
        "volume_rate": volume_rate,
        "n_pages": n_pages,
        "raw_fields": fields,
    }
    return meta


def interpret_scanimage_dimensions(meta, n_pages=None):
    """(num_volumes, slices_per_volume, channels) from metadata + page count.

    When num_volumes is missing it is derived from the page count:
    pages = volumes * slices * frames_per_slice * channels.
    """
    slices = max(1, meta.get("slices_per_volume") or 1)
    channels = max(1, meta.get("channels") or 1)
    fps = max(1, meta.get("frames_per_slice") or 1)
    volumes = meta.get("num_volumes")
    n_pages = n_pages if n_pages is not None else meta.get("n_pages")
    if volumes is None and n_pages:
        per_volume = slices * channels * fps
        volumes = max(1, n_pages // per_volume)
    return volumes or 1, slices, channels


def format_scanimage_report(meta):
    """Human-readable summary (parity: reference _scanimage.py report)."""
    if not meta:
        return "Not a ScanImage TIFF (no SI metadata found)."
    vol, sl, ch = interpret_scanimage_dimensions(meta)
    lines = [
        "ScanImage TIFF detected:",
        f"  channels:          {ch}",
        f"  slices/volume:     {sl}",
        f"  frames/slice:      {meta.get('frames_per_slice')}",
        f"  volumes:           {vol}",
    ]
    if meta.get("z_step") is not None:
        lines.append(f"  z step:            {meta['z_step']} um")
    if meta.get("frame_rate") is not None:
        lines.append(f"  frame rate:        {meta['frame_rate']} Hz")
    if meta.get("volume_rate") is not None:
        lines.append(f"  volume rate:       {meta['volume_rate']} Hz")
    return "\n".join(lines)
