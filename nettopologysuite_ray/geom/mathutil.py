"""Public scalar math kernels: angles, triangles, 2D vectors, homogeneous
coordinates (reference: Algorithm/Angle.cs AngleUtility,
Geometries/Triangle.cs, Mathematics/Vector2D.cs, Algorithm/HCoordinate.cs).

Points are plain (x, y[, z]) tuples / sequences — these kernels are the
scalar building blocks the vectorized batch stages compose; they are
exposed as a public surface so pipelines can use them in UDF stages.
"""

from __future__ import annotations

import math
from fractions import Fraction

PI_TIMES_2 = 2.0 * math.pi
PI_OVER_2 = math.pi / 2.0
PI_OVER_4 = math.pi / 4.0

COUNTERCLOCKWISE = 1
CLOCKWISE = -1
NONE = 0


# ---------------------------------------------------------------------------
# AngleUtility (reference: Algorithm/Angle.cs:9)

def to_degrees(radians: float) -> float:
    return (radians * 180.0) / math.pi


def to_radians(degrees: float) -> float:
    return (degrees * math.pi) / 180.0


def angle(p0, p1=None) -> float:
    """Angle of the vector p0→p1 (or origin→p0), in (-Pi, Pi]."""
    if p1 is None:
        return math.atan2(p0[1], p0[0])
    return math.atan2(p1[1] - p0[1], p1[0] - p0[0])


def is_acute(p0, p1, p2) -> bool:
    """True iff the angle at p1 in p0-p1-p2 is acute (dot-product sign;
    not robust for angles near Pi/2)."""
    dx0, dy0 = p0[0] - p1[0], p0[1] - p1[1]
    dx1, dy1 = p2[0] - p1[0], p2[1] - p1[1]
    return dx0 * dx1 + dy0 * dy1 > 0


def is_obtuse(p0, p1, p2) -> bool:
    dx0, dy0 = p0[0] - p1[0], p0[1] - p1[1]
    dx1, dy1 = p2[0] - p1[0], p2[1] - p1[1]
    return dx0 * dx1 + dy0 * dy1 < 0


def angle_between(tip1, tail, tip2) -> float:
    """Unoriented smallest angle between the two vectors, in [0, Pi]."""
    return diff(angle(tail, tip1), angle(tail, tip2))


def angle_between_oriented(tip1, tail, tip2) -> float:
    """Oriented smallest angle from v1 to v2, in (-Pi, Pi]; positive = CCW."""
    ang_del = angle(tail, tip2) - angle(tail, tip1)
    if ang_del <= -math.pi:
        return ang_del + PI_TIMES_2
    if ang_del > math.pi:
        return ang_del - PI_TIMES_2
    return ang_del


def bisector(tip1, tail, tip2) -> float:
    """Angle of the unoriented bisector of the smallest angle between the
    vectors, in (-Pi, Pi]."""
    ang_del = angle_between_oriented(tip1, tail, tip2)
    return normalize(angle(tail, tip1) + ang_del / 2.0)


def interior_angle(p0, p1, p2) -> float:
    """Interior angle at p1 of a CW-oriented ring, in [0, 2Pi)."""
    angle_prev = angle(p1, p0)
    angle_next = angle(p1, p2)
    return normalize_positive(angle_next - angle_prev)


def get_turn(ang1: float, ang2: float) -> int:
    """Turn direction (CCW=1, CW=-1, NONE=0) for ang1 to overlap ang2."""
    crossproduct = math.sin(ang2 - ang1)
    if crossproduct > 0:
        return COUNTERCLOCKWISE
    if crossproduct < 0:
        return CLOCKWISE
    return NONE


def normalize(ang: float) -> float:
    """Equivalent angle in (-Pi, Pi]."""
    while ang > math.pi:
        ang -= PI_TIMES_2
    while ang <= -math.pi:
        ang += PI_TIMES_2
    return ang


def normalize_positive(ang: float) -> float:
    """Equivalent angle in [0, 2Pi), with the reference's round-off clamps."""
    if ang < 0.0:
        while ang < 0.0:
            ang += PI_TIMES_2
        if ang >= PI_TIMES_2:
            ang = 0.0
    else:
        while ang >= PI_TIMES_2:
            ang -= PI_TIMES_2
        if ang < 0.0:
            ang = 0.0
    return ang


def diff(ang1: float, ang2: float) -> float:
    """Unoriented smallest difference between normalized angles, in [0, Pi]."""
    del_angle = ang2 - ang1 if ang1 < ang2 else ang1 - ang2
    if del_angle > math.pi:
        del_angle = PI_TIMES_2 - del_angle
    return del_angle


def sin_snap(ang: float) -> float:
    """sin with near-zero snapped to exactly 0 (|res| < 5e-16)."""
    res = math.sin(ang)
    return 0.0 if abs(res) < 5e-16 else res


def cos_snap(ang: float) -> float:
    res = math.cos(ang)
    return 0.0 if abs(res) < 5e-16 else res


def project(p, ang: float, dist: float):
    """Project a point by angle and distance (snapped trig)."""
    return (p[0] + dist * cos_snap(ang), p[1] + dist * sin_snap(ang))


# ---------------------------------------------------------------------------
# HCoordinate (reference: Algorithm/HCoordinate.cs) — homogeneous (x, y, w)

class HCoordinate:
    __slots__ = ("x", "y", "w")

    def __init__(self, x: float = 0.0, y: float = 0.0, w: float = 1.0):
        self.x, self.y, self.w = float(x), float(y), float(w)

    @classmethod
    def from_points(cls, p1: "HCoordinate", p2: "HCoordinate") -> "HCoordinate":
        """The line (cross product) through two homogeneous points — also
        the intersection point of two homogeneous lines."""
        return cls(
            p1.y * p2.w - p2.y * p1.w,
            p2.x * p1.w - p1.x * p2.w,
            p1.x * p2.y - p2.x * p1.y,
        )

    def get_coordinate(self):
        """Cartesian (x, y); raises on a point at infinity (w == 0 or
        non-finite ratio), mirroring NotRepresentableException."""
        x, y = self.x / self.w, self.y / self.w
        if not (math.isfinite(x) and math.isfinite(y)):
            raise ValueError("HCoordinate not representable")
        return (x, y)


def line_intersection(p1, p2, q1, q2):
    """Infinite-line intersection via homogeneous coordinates, with the
    reference's ordinate conditioning — subtract the midpoint of the
    envelope-intersection "kernel" before the unrolled computation, add
    it back after (reference: Algorithm/IntersectionComputer.cs; keeps
    large-ordinate nearly-parallel cases accurate).  Raises ValueError
    for parallel lines."""
    midx = (
        max(min(p1[0], p2[0]), min(q1[0], q2[0]))
        + min(max(p1[0], p2[0]), max(q1[0], q2[0]))
    ) / 2.0
    midy = (
        max(min(p1[1], p2[1]), min(q1[1], q2[1]))
        + min(max(p1[1], p2[1]), max(q1[1], q2[1]))
    ) / 2.0
    p1 = (p1[0] - midx, p1[1] - midy)
    p2 = (p2[0] - midx, p2[1] - midy)
    q1 = (q1[0] - midx, q1[1] - midy)
    q2 = (q2[0] - midx, q2[1] - midy)
    px = p1[1] - p2[1]
    py = p2[0] - p1[0]
    pw = p1[0] * p2[1] - p2[0] * p1[1]
    qx = q1[1] - q2[1]
    qy = q2[0] - q1[0]
    qw = q1[0] * q2[1] - q2[0] * q1[1]
    x = py * qw - qy * pw
    y = qx * pw - px * qw
    w = px * qy - qx * py
    if w == 0.0:
        raise ValueError("lines are parallel")
    xr, yr = x / w, y / w
    if not (math.isfinite(xr) and math.isfinite(yr)):
        raise ValueError("lines are parallel")
    return (xr + midx, yr + midy)


# ---------------------------------------------------------------------------
# Triangle (reference: Geometries/Triangle.cs)

def _dist(a, b) -> float:
    return math.hypot(b[0] - a[0], b[1] - a[1])


def _det(m00, m01, m10, m11):
    return m00 * m11 - m01 * m10


class Triangle:
    """Triangle kernels; static functions operate on (x, y[, z]) points,
    instance methods mirror the reference's convenience wrappers."""

    __slots__ = ("p0", "p1", "p2")

    def __init__(self, p0, p1, p2):
        self.p0, self.p1, self.p2 = p0, p1, p2

    # -- static kernels ---------------------------------------------------
    @staticmethod
    def is_acute(a, b, c) -> bool:
        """All interior angles acute."""
        return is_acute(b, a, c) and is_acute(a, b, c) and is_acute(a, c, b)

    @staticmethod
    def is_ccw(a, b, c) -> bool:
        from .algorithms import orient2d

        return orient2d(a[0], a[1], b[0], b[1], c[0], c[1]) > 0

    @staticmethod
    def intersects(a, b, c, p) -> bool:
        """p inside or on the triangle (orientation-uniform sign test)."""
        from .algorithms import orient2d

        s1 = orient2d(a[0], a[1], b[0], b[1], p[0], p[1])
        s2 = orient2d(b[0], b[1], c[0], c[1], p[0], p[1])
        s3 = orient2d(c[0], c[1], a[0], a[1], p[0], p[1])
        return (s1 >= 0 and s2 >= 0 and s3 >= 0) or (
            s1 <= 0 and s2 <= 0 and s3 <= 0
        )

    @staticmethod
    def perpendicular_bisector(a, b) -> HCoordinate:
        dx = b[0] - a[0]
        dy = b[1] - a[1]
        l1 = HCoordinate(a[0] + dx / 2.0, a[1] + dy / 2.0, 1.0)
        l2 = HCoordinate(a[0] - dy + dx / 2.0, a[1] + dx + dy / 2.0, 1.0)
        return HCoordinate.from_points(l1, l2)

    @staticmethod
    def circumradius(a, b, c) -> float:
        la, lb, lc = _dist(a, b), _dist(b, c), _dist(c, a)
        area = Triangle.area(a, b, c)
        if area == 0.0:
            return math.inf
        return (la * lb * lc) / (4.0 * area)

    @staticmethod
    def circumcentre(a, b, c):
        cx, cy = c[0], c[1]
        ax, ay = a[0] - cx, a[1] - cy
        bx, by = b[0] - cx, b[1] - cy
        denom = 2.0 * _det(ax, ay, bx, by)
        numx = _det(ay, ax * ax + ay * ay, by, bx * bx + by * by)
        numy = _det(ax, ax * ax + ay * ay, bx, bx * bx + by * by)
        return (cx - numx / denom, cy + numy / denom)

    @staticmethod
    def circumcentre_exact(a, b, c):
        """Extended-precision circumcentre (reference CircumcentreDD role,
        exact rationals instead of double-double)."""
        ax, ay = Fraction(a[0]) - Fraction(c[0]), Fraction(a[1]) - Fraction(c[1])
        bx, by = Fraction(b[0]) - Fraction(c[0]), Fraction(b[1]) - Fraction(c[1])
        denom = 2 * (ax * by - ay * bx)
        asqr = ax * ax + ay * ay
        bsqr = bx * bx + by * by
        numx = ay * bsqr - by * asqr
        numy = ax * bsqr - bx * asqr
        return (
            float(Fraction(c[0]) - numx / denom),
            float(Fraction(c[1]) + numy / denom),
        )

    @staticmethod
    def in_centre(a, b, c):
        len0 = _dist(b, c)
        len1 = _dist(a, c)
        len2 = _dist(a, b)
        circum = len0 + len1 + len2
        return (
            (len0 * a[0] + len1 * b[0] + len2 * c[0]) / circum,
            (len0 * a[1] + len1 * b[1] + len2 * c[1]) / circum,
        )

    @staticmethod
    def centroid(a, b, c):
        return ((a[0] + b[0] + c[0]) / 3.0, (a[1] + b[1] + c[1]) / 3.0)

    @staticmethod
    def length(a, b, c) -> float:
        return _dist(a, b) + _dist(b, c) + _dist(c, a)

    @staticmethod
    def longest_side_length(a, b, c) -> float:
        return max(_dist(a, b), _dist(b, c), _dist(c, a))

    @staticmethod
    def angle_bisector(a, b, c):
        """Point where the bisector from b splits segment a-c (split parts
        proportional to adjacent side lengths)."""
        len0 = _dist(b, a)
        len2 = _dist(b, c)
        frac = len0 / (len0 + len2)
        return (a[0] + frac * (c[0] - a[0]), a[1] + frac * (c[1] - a[1]))

    @staticmethod
    def area(a, b, c) -> float:
        return (
            abs(
                a[0] * (c[1] - b[1])
                + b[0] * (a[1] - c[1])
                + c[0] * (b[1] - a[1])
            )
            / 2.0
        )

    @staticmethod
    def signed_area(a, b, c) -> float:
        """Positive for CW a-b-c (the reference's convention)."""
        return (
            (c[0] - a[0]) * (b[1] - a[1]) - (b[0] - a[0]) * (c[1] - a[1])
        ) / 2.0

    @staticmethod
    def area_3d(a, b, c) -> float:
        ux, uy, uz = b[0] - a[0], b[1] - a[1], b[2] - a[2]
        vx, vy, vz = c[0] - a[0], c[1] - a[1], c[2] - a[2]
        crossx = uy * vz - uz * vy
        crossy = uz * vx - ux * vz
        crossz = ux * vy - uy * vx
        return math.sqrt(crossx * crossx + crossy * crossy + crossz * crossz) / 2.0

    @staticmethod
    def interpolate_z(p, v0, v1, v2) -> float:
        """Z of point p from the plane through v0-v1-v2 (barycentric)."""
        x0, y0 = v0[0], v0[1]
        a = v1[0] - x0
        b = v2[0] - x0
        c = v1[1] - y0
        d = v2[1] - y0
        det = a * d - b * c
        dx = p[0] - x0
        dy = p[1] - y0
        t = (d * dx - b * dy) / det
        u = (-c * dx + a * dy) / det
        return v0[2] + t * (v1[2] - v0[2]) + u * (v2[2] - v0[2])

    # -- instance wrappers -------------------------------------------------
    def in_centre_pt(self):
        return Triangle.in_centre(self.p0, self.p1, self.p2)

    def circumcentre_pt(self):
        return Triangle.circumcentre(self.p0, self.p1, self.p2)

    def circumradius_val(self) -> float:
        return Triangle.circumradius(self.p0, self.p1, self.p2)

    def centroid_pt(self):
        return Triangle.centroid(self.p0, self.p1, self.p2)

    def length_val(self) -> float:
        return Triangle.length(self.p0, self.p1, self.p2)

    def longest_side_length_val(self) -> float:
        return Triangle.longest_side_length(self.p0, self.p1, self.p2)

    def area_val(self) -> float:
        return Triangle.area(self.p0, self.p1, self.p2)

    def signed_area_val(self) -> float:
        return Triangle.signed_area(self.p0, self.p1, self.p2)

    def area_3d_val(self) -> float:
        return Triangle.area_3d(self.p0, self.p1, self.p2)

    def interpolate_z_val(self, p) -> float:
        return Triangle.interpolate_z(p, self.p0, self.p1, self.p2)


# ---------------------------------------------------------------------------
# Vector2D (reference: Mathematics/Vector2D.cs)

class Vector2D:
    __slots__ = ("x", "y")

    def __init__(self, x: float = 0.0, y: float = 0.0):
        self.x, self.y = float(x), float(y)

    @classmethod
    def create(cls, x, y=None) -> "Vector2D":
        """create(x, y) / create(point) / create(from_pt, to_pt)."""
        if y is None:
            return cls(x[0], x[1])
        if hasattr(x, "__len__") and hasattr(y, "__len__"):
            return cls(y[0] - x[0], y[1] - x[1])
        return cls(x, y)

    def add(self, v: "Vector2D") -> "Vector2D":
        return Vector2D(self.x + v.x, self.y + v.y)

    def subtract(self, v: "Vector2D") -> "Vector2D":
        return Vector2D(self.x - v.x, self.y - v.y)

    def multiply(self, d: float) -> "Vector2D":
        return Vector2D(self.x * d, self.y * d)

    def divide(self, d: float) -> "Vector2D":
        return Vector2D(self.x / d, self.y / d)

    def negate(self) -> "Vector2D":
        return Vector2D(-self.x, -self.y)

    def length(self) -> float:
        return math.hypot(self.x, self.y)

    def length_squared(self) -> float:
        return self.x * self.x + self.y * self.y

    def normalize(self) -> "Vector2D":
        l = self.length()
        if l > 0.0:
            return self.divide(l)
        return Vector2D(0.0, 0.0)

    def average(self, v: "Vector2D") -> "Vector2D":
        return self.weighted_sum(v, 0.5)

    def weighted_sum(self, v: "Vector2D", frac: float) -> "Vector2D":
        return Vector2D(
            frac * self.x + (1 - frac) * v.x, frac * self.y + (1 - frac) * v.y
        )

    def distance(self, v: "Vector2D") -> float:
        return math.hypot(v.x - self.x, v.y - self.y)

    def dot(self, v: "Vector2D") -> float:
        return self.x * v.x + self.y * v.y

    def angle(self, v: "Vector2D | None" = None) -> float:
        if v is None:
            return math.atan2(self.y, self.x)
        return diff(v.angle(), self.angle())

    def angle_to(self, v: "Vector2D") -> float:
        """Oriented angle from this to v, in (-Pi, Pi]."""
        a1 = self.angle()
        a2 = v.angle()
        return normalize(a2 - a1)

    def rotate(self, ang: float) -> "Vector2D":
        cos_a, sin_a = math.cos(ang), math.sin(ang)
        return Vector2D(
            self.x * cos_a - self.y * sin_a, self.x * sin_a + self.y * cos_a
        )

    def rotate_by_quarter_circle(self, num_quarters: int) -> "Vector2D":
        nq = num_quarters % 4
        if nq < 0:
            nq += 4
        if nq == 0:
            return Vector2D(self.x, self.y)
        if nq == 1:
            return Vector2D(-self.y, self.x)
        if nq == 2:
            return Vector2D(-self.x, -self.y)
        return Vector2D(self.y, -self.x)

    def is_parallel(self, v: "Vector2D") -> bool:
        from .algorithms import orient2d

        return orient2d(0.0, 0.0, self.x, self.y, v.x, v.y) == 0

    def translate(self, coord):
        return (self.x + coord[0], self.y + coord[1])

    def to_coordinate(self):
        return (self.x, self.y)

    def __add__(self, other: "Vector2D") -> "Vector2D":
        return self.add(other)

    def __sub__(self, other: "Vector2D") -> "Vector2D":
        return self.subtract(other)

    def __mul__(self, d: float) -> "Vector2D":
        return self.multiply(d)

    def __neg__(self) -> "Vector2D":
        return self.negate()

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, Vector2D) and self.x == other.x and self.y == other.y
        )

    def __hash__(self) -> int:
        return hash((self.x, self.y))

    def __repr__(self) -> str:
        return f"[{self.x}, {self.y}]"


# ---------------------------------------------------------------------------
# Vector3D (reference: Mathematics/Vector3D.cs)

class Vector3D:
    __slots__ = ("x", "y", "z")

    def __init__(self, x: float = 0.0, y: float = 0.0, z: float = 0.0):
        self.x, self.y, self.z = float(x), float(y), float(z)

    @classmethod
    def create(cls, x, y=None, z=None) -> "Vector3D":
        if y is None:
            return cls(x[0], x[1], x[2])
        return cls(x, y, z)

    @classmethod
    def from_points(cls, a, b) -> "Vector3D":
        return cls(b[0] - a[0], b[1] - a[1], b[2] - a[2])

    @staticmethod
    def dot4(a, b, c, d) -> float:
        """Dot of vectors ab and cd given as point pairs (reference
        Vector3D.Dot(A, B, C, D))."""
        return (
            (b[0] - a[0]) * (d[0] - c[0])
            + (b[1] - a[1]) * (d[1] - c[1])
            + (b[2] - a[2]) * (d[2] - c[2])
        )

    def add(self, v: "Vector3D") -> "Vector3D":
        return Vector3D(self.x + v.x, self.y + v.y, self.z + v.z)

    def subtract(self, v: "Vector3D") -> "Vector3D":
        return Vector3D(self.x - v.x, self.y - v.y, self.z - v.z)

    def divide(self, d: float) -> "Vector3D":
        return Vector3D(self.x / d, self.y / d, self.z / d)

    def dot(self, v: "Vector3D") -> float:
        return self.x * v.x + self.y * v.y + self.z * v.z

    def cross(self, v: "Vector3D") -> "Vector3D":
        return Vector3D(
            self.y * v.z - self.z * v.y,
            self.z * v.x - self.x * v.z,
            self.x * v.y - self.y * v.x,
        )

    def length(self) -> float:
        return math.sqrt(self.x * self.x + self.y * self.y + self.z * self.z)

    def normalize(self) -> "Vector3D":
        ln = self.length()
        if ln > 0.0:
            return self.divide(ln)
        return Vector3D(0.0, 0.0, 0.0)

    def __add__(self, other: "Vector3D") -> "Vector3D":
        return self.add(other)

    def __sub__(self, other: "Vector3D") -> "Vector3D":
        return self.subtract(other)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, Vector3D)
            and self.x == other.x
            and self.y == other.y
            and self.z == other.z
        )

    def __hash__(self) -> int:
        return hash((self.x, self.y, self.z))

    def __repr__(self) -> str:
        return f"[{self.x}, {self.y}, {self.z}]"


# ---------------------------------------------------------------------------
# affine transformation toolbox
# (reference: Geometries/Utilities/AffineTransformation.cs — matrices are
#  6-tuples (m00, m01, m02, m10, m11, m12), the exact parameter order of
#  stages/geometry.py affine_stage: x' = m00 x + m01 y + m02, etc.)

AFFINE_IDENTITY = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0)


def affine_compose(after, first):
    """after . first (apply ``first``, then ``after``) — the reference's
    AffineTransformation.Compose (AffineTransformation.cs:905)."""
    a2, b2, c2, d2, e2, f2 = after
    a1, b1, c1, d1, e1, f1 = first
    return (
        a2 * a1 + b2 * d1,
        a2 * b1 + b2 * e1,
        a2 * c1 + b2 * f1 + c2,
        d2 * a1 + e2 * d1,
        d2 * b1 + e2 * e1,
        d2 * c1 + e2 * f1 + f2,
    )


def affine_apply(m, x: float, y: float):
    a, b, c, d, e, f = m
    return (a * x + b * y + c, d * x + e * y + f)


def affine_translation(dx: float, dy: float):
    return (1.0, 0.0, float(dx), 0.0, 1.0, float(dy))


def affine_rotation(theta: float, x: float = 0.0, y: float = 0.0):
    """CCW rotation by theta about (x, y) (RotationInstance)."""
    s, c = math.sin(theta), math.cos(theta)
    return (c, -s, x - x * c + y * s, s, c, y - x * s - y * c)


def affine_scaling(sx: float, sy: float):
    return (float(sx), 0.0, 0.0, 0.0, float(sy), 0.0)


def affine_shear(sx: float, sy: float):
    return (1.0, float(sx), 0.0, float(sy), 1.0, 0.0)


def affine_reflection(x0: float, y0: float, x1: float = None, y1: float = None):
    """Reflection about the line (x0,y0)-(x1,y1), or (0,0)-(x0,y0) when
    only one point is given (SetToReflection)."""
    if x1 is None:
        x0, y0, x1, y1 = 0.0, 0.0, x0, y0
    dx, dy = x1 - x0, y1 - y0
    ln = math.hypot(dx, dy)
    if ln == 0.0:
        raise ValueError("reflection line has zero length")
    s, c = dy / ln, dx / ln
    # translate to origin, rotate line to x-axis, flip y, rotate/translate back
    m = affine_compose(affine_rotation(0.0), affine_translation(-x0, -y0))
    m = affine_compose((c, s, 0.0, -s, c, 0.0), m)
    m = affine_compose(affine_scaling(1.0, -1.0), m)
    m = affine_compose((c, -s, 0.0, s, c, 0.0), m)
    return affine_compose(affine_translation(x0, y0), m)


def affine_from_control_vectors(src, dest):
    """Affine matrix mapping 1-3 source control points onto their images
    (reference: AffineTransformationFactory.cs:25-114,
    AffineTransformationBuilder.cs:46).  Three vectors solve the full
    affine (None when the source points are collinear); two vectors give
    rotation + uniform scale + translation (None for a zero-length
    source baseline); one vector gives a translation.

    Documented deviation: the reference's two-vector rule measures the
    rotation against the raw dest delta as an absolute point
    (AffineTransformationFactory.cs:51), which only maps src1 onto dest1
    when src0 is the origin; here the delta is re-anchored at src0 (as
    the reference's own CreateFromBaseLines does at line 135) so both
    control points map exactly for any src0."""
    import numpy as np

    if len(src) != len(dest):
        raise ValueError("src and dest must have the same length")
    if not 1 <= len(src) <= 3:
        raise ValueError("between 1 and 3 control vectors required")
    if len(src) == 1:
        return affine_translation(dest[0][0] - src[0][0], dest[0][1] - src[0][1])
    if len(src) == 2:
        (s0, s1), (d0, d1) = src, dest
        src_dist = math.hypot(s1[0] - s0[0], s1[1] - s0[1])
        if src_dist == 0.0:
            return None
        rot_pt = (s0[0] + d1[0] - d0[0], s0[1] + d1[1] - d0[1])
        ang = angle_between_oriented(s1, s0, rot_pt)
        scale = math.hypot(d1[0] - d0[0], d1[1] - d0[1]) / src_dist
        m = affine_translation(-s0[0], -s0[1])
        m = affine_compose(affine_rotation(ang), m)
        m = affine_compose(affine_scaling(scale, scale), m)
        return affine_compose(affine_translation(d0[0], d0[1]), m)
    # three vectors: solve the two 3x3 systems (builder Compute/Solve)
    A = np.array([[p[0], p[1], 1.0] for p in src], dtype=np.float64)
    if np.linalg.det(A) == 0.0:
        return None
    bx = np.array([p[0] for p in dest], dtype=np.float64)
    by = np.array([p[1] for p in dest], dtype=np.float64)
    try:
        row0 = np.linalg.solve(A, bx)
        row1 = np.linalg.solve(A, by)
    except np.linalg.LinAlgError:
        return None
    return (row0[0], row0[1], row0[2], row1[0], row1[1], row1[2])


def affine_from_baselines(src0, src1, dest0, dest1):
    """Baseline-to-baseline transform: translate src0->dest0, rotate
    through the baseline angle, scale by the length ratio; identity for
    a zero-length source baseline (AffineTransformationFactory.cs:131)."""
    src_dist = math.hypot(src1[0] - src0[0], src1[1] - src0[1])
    if src_dist == 0.0:
        return AFFINE_IDENTITY
    rot_pt = (src0[0] + dest1[0] - dest0[0], src0[1] + dest1[1] - dest0[1])
    ang = angle_between_oriented(src1, src0, rot_pt)
    scale = math.hypot(dest1[0] - dest0[0], dest1[1] - dest0[1]) / src_dist
    m = affine_translation(-src0[0], -src0[1])
    m = affine_compose(affine_rotation(ang), m)
    m = affine_compose(affine_scaling(scale, scale), m)
    return affine_compose(affine_translation(dest0[0], dest0[1]), m)
