"""Independent NumPy fp64 oracle for the PTZ camera model (SURVEY.md §6 item 1).

Written without reference to ptzjax.geometry's code paths: scalar loops, no
clipping, float64 — the straightforward transcription of SURVEY.md §8.1.
"""

import numpy as np


def project_one(pan, tilt, f, theta, phi, cx, cy):
    u = theta - pan
    v = phi - tilt
    x = f * np.tan(u) + cx
    y = -f * np.tan(v) / np.cos(u) + cy
    return x, y


def project(camera, rays, cx, cy):
    pan, tilt, f = camera
    out = np.zeros((len(rays), 2), np.float64)
    for i, (th, ph) in enumerate(rays):
        out[i] = project_one(pan, tilt, f, th, ph, cx, cy)
    return out


def back_project_one(pan, tilt, f, x, y, cx, cy):
    u = np.arctan((x - cx) / f)
    theta = pan + u
    phi = tilt + np.arctan(-(y - cy) * np.cos(u) / f)
    return theta, phi


def back_project(camera, pixels, cx, cy):
    pan, tilt, f = camera
    out = np.zeros((len(pixels), 2), np.float64)
    for i, (x, y) in enumerate(pixels):
        out[i] = back_project_one(pan, tilt, f, x, y, cx, cy)
    return out


def jacobian_fd(camera, ray, cx, cy, eps=1e-6):
    """Finite-difference Jacobians d(x,y)/d(pan,tilt,f) and d(x,y)/d(theta,phi)."""
    pan, tilt, f = camera
    theta, phi = ray

    def fn(params):
        p, t, fo, th, ph = params
        return np.array(project_one(p, t, fo, th, ph, cx, cy))

    p0 = np.array([pan, tilt, f, theta, phi], np.float64)
    J = np.zeros((2, 5))
    for k in range(5):
        d = np.zeros(5)
        d[k] = eps * max(1.0, abs(p0[k]))
        J[:, k] = (fn(p0 + d) - fn(p0 - d)) / (2 * d[k])
    return J[:, :3], J[:, 3:]


def rays_from_points(points, center, Rb):
    out = np.zeros((len(points), 2), np.float64)
    for i, X in enumerate(points):
        d = Rb @ (np.asarray(X, np.float64) - center)
        out[i, 0] = np.arctan2(d[0], d[2])
        out[i, 1] = np.arctan2(-d[1], np.hypot(d[0], d[2]))
    return out
