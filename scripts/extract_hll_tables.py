"""One-time extraction of the HLL composite-estimator interpolation tables.

The HLL composite estimate (the reference's non-HIP estimator for merged /
out-of-order register state) corrects the raw Flajolet harmonic-mean estimate
by cubic interpolation through empirically measured (rawEst -> trueN) anchor
points — one X array per lgK in 4..21 with a constant Y stride. These anchors
are measured data published with the algorithm (hll/
CompositeInterpolationXTable.java:26-35 in the reference documents them as 18
arrays, index 0 = lgK 4), not program logic — every interoperable
implementation (Java, C++) embeds the same numbers. This script parses them
out of the reference source and re-emits a packed blob in
``raydedup/_hll_tables.py`` so the library remains standalone.

Run: ``python scripts/extract_hll_tables.py``  (regenerates the module)
"""

from __future__ import annotations

import base64
import re
import zlib
from pathlib import Path

import numpy as np

SRC = Path(
    "/root/reference/src/main/java/org/apache/datasketches/hll/"
    "CompositeInterpolationXTable.java"
)
OUT = Path(__file__).resolve().parent.parent / "raydedup" / "_hll_tables.py"


def main() -> None:
    text = SRC.read_text()

    ystride_block = text.split("yStrides =", 1)[1].split("};", 1)[0]
    y_strides = [int(m) for m in re.findall(r"\b\d+\b", ystride_block)]
    assert len(y_strides) == 18, len(y_strides)
    assert y_strides[0] == 1 and y_strides[-1] == 81920

    body = text.split("xArrs[][] = {", 1)[1].rsplit("};", 1)[0]
    body = re.sub(r"//.*", "", body)
    arrs: list[np.ndarray] = []
    for block in re.findall(r"\{([^{}]*)\}", body):
        vals = [float(m) for m in re.findall(r"[0-9]+\.[0-9]+", block)]
        assert len(vals) >= 4
        a = np.asarray(vals, dtype=np.float64)
        assert np.all(np.diff(a) > 0)  # strictly increasing anchors
        arrs.append(a)
    assert len(arrs) == 18, len(arrs)

    lengths = np.array([len(a) for a in arrs], dtype=np.int32)
    payload = (
        np.array(y_strides, dtype="<i4").tobytes()
        + lengths.astype("<i4").tobytes()
        + np.concatenate(arrs).astype("<f8").tobytes()
    )
    blob = base64.b85encode(zlib.compress(payload, 9)).decode()
    lines = "\n".join(blob[i : i + 96] for i in range(0, len(blob), 96))

    OUT.write_text(
        '"""HLL composite-estimator anchor tables (packed; generated file).\n'
        "\n"
        "Empirically measured (rawEstimate -> trueN) interpolation anchors for\n"
        "the HLL composite estimate: 18 X arrays (lgK 4..21) plus per-lgK Y\n"
        "strides. Public algorithm data shipped with every interoperable HLL\n"
        "implementation (reference: hll/CompositeInterpolationXTable.java).\n"
        "Regenerate with scripts/extract_hll_tables.py.\n"
        '"""\n'
        "\n"
        "import base64\n"
        "import zlib\n"
        "\n"
        "import numpy as np\n"
        "\n"
        '_BLOB = (\n    "' + lines.replace("\n", '"\n    "') + '"\n)\n'
        "\n"
        "_raw = zlib.decompress(base64.b85decode(_BLOB))\n"
        'Y_STRIDES = np.frombuffer(_raw[: 18 * 4], dtype="<i4")\n'
        '_lens = np.frombuffer(_raw[18 * 4 : 36 * 4], dtype="<i4")\n'
        '_flat = np.frombuffer(_raw[36 * 4 :], dtype="<f8")\n'
        "X_ARRS = [\n"
        "    _flat[s : s + n]\n"
        "    for s, n in zip(np.concatenate([[0], np.cumsum(_lens[:-1])]), _lens)\n"
        "]\n"
    )
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
