"""Result writers: STL and TXT, format-compatible with the reference
(save3DLinesAsSTL line3D.cc:384-430, save3DLinesAsTXT line3D.cc:433-473,
format documented README.txt:177-186).
"""
from __future__ import annotations

import numpy as np


def save_stl(result: list, filename: str):
    """Degenerate-facet STL: each 3D sub-segment becomes one facet with the
    first vertex repeated (line3D.cc:418-424)."""
    with open(filename, "w") as f:
        f.write("solid lineModel\n")
        for line in result:
            for seg in line.segments3d:
                P1, P2 = seg[0], seg[1]
                v1 = " ".join("%e" % x for x in P1)
                v2 = " ".join("%e" % x for x in P2)
                f.write(" facet normal 1.0e+000 0.0e+000 0.0e+000\n")
                f.write("  outer loop\n")
                f.write(f"   vertex {v1}\n")
                f.write(f"   vertex {v2}\n")
                f.write(f"   vertex {v1}\n")
                f.write("  endloop\n")
                f.write(" endfacet\n")
        f.write("endsolid lineModel\n")


def _fmt(x: float) -> str:
    """Default C++ ostream float formatting (6 significant digits)."""
    return f"{x:.6g}"


def save_txt(result: list, filename: str, get_segment_2d=None,
             view_id_map=None):
    """One line per 3D line:  n  P1 Q1 ... Pn Qn  m  camID segID p q ...

    get_segment_2d(view, seg) must return the (x1, y1, x2, y2) coords of a 2D
    residual segment.  view_id_map maps internal dense view indices back to
    the caller's external image ids (the reference uses external ids).
    """
    with open(filename, "w") as f:
        for line in result:
            if len(line.segments3d) == 0:
                continue
            parts = [str(len(line.segments3d))]
            for seg in line.segments3d:
                parts += [_fmt(v) for v in seg[0]] + [_fmt(v) for v in seg[1]]
            parts.append(str(len(line.views2d)))
            for v, s in zip(line.views2d, line.segs2d):
                ext = int(v) if view_id_map is None else int(view_id_map[int(v)])
                parts += [str(ext), str(int(s))]
                if get_segment_2d is not None:
                    coords = get_segment_2d(int(v), int(s))
                    parts += [_fmt(float(c)) for c in coords]
                else:
                    parts += ["0", "0", "0", "0"]
            f.write(" ".join(parts) + " \n")


def load_txt(filename: str):
    """Parse a TXT result file back into (segments3d, residuals) lists —
    used by the golden-file tests."""
    out = []
    with open(filename) as f:
        for raw in f:
            tok = raw.split()
            if not tok:
                continue
            p = 0
            n = int(tok[p]); p += 1
            segs = np.array([float(x) for x in tok[p:p + 6 * n]],
                            np.float64).reshape(n, 2, 3)
            p += 6 * n
            m = int(tok[p]); p += 1
            res = []
            for _ in range(m):
                cam, seg = int(tok[p]), int(tok[p + 1])
                coords = [float(x) for x in tok[p + 2:p + 6]]
                res.append((cam, seg, coords))
                p += 6
            out.append((segs, res))
    return out
