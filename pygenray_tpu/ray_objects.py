"""Result containers: Ray, RayFan, EigenRays.

API-parity with the reference (`/root/reference/src/pygenray/ray_objects.py`),
numpy-backed.  Sign conventions: the integrator works in the ODE convention
(z positive down); these objects store the user convention z = -y[1],
p = -y[2] (reference `ray_objects.py:51-52`, `docs/ray_physics.md:3-7`).

``RayFan.from_arrays`` is the TPU-native constructor: it ingests whole
batched device arrays without materializing per-ray Python objects, which
matters at 10^5+ rays.
"""

from __future__ import annotations

import numpy as np

__all__ = ["Ray", "RayFan", "EigenRays"]


class Ray:
    """A single ray trajectory with bounce counts and metadata."""

    def __init__(self, r, y, n_bottom, n_surface, launch_angle=None, source_depth=None):
        """``y`` is (3, N) = [travel time, depth, ray parameter] in the
        positive-z-down ODE convention; stored attributes flip to the user
        convention (z negative down)."""
        y = np.asarray(y)
        self.r = np.asarray(r)
        self.t = y[0, :]
        self.z = -y[1, :]
        self.p = -y[2, :]
        self.n_bottom = n_bottom
        self.n_surface = n_surface
        if launch_angle is not None:
            self.launch_angle = launch_angle
        if source_depth is not None:
            self.source_depth = source_depth

    def plot(self, **kwargs):
        from matplotlib import pyplot as plt

        plot_kwargs = {"c": "k", "lw": 1, "alpha": 0.5}
        plot_kwargs.update(kwargs)
        plt.plot(self.r, self.z, **kwargs)
        plt.xlabel("time [s]")
        plt.ylabel("depth [m]")
        plt.ylim([self.z.min(), self.z.max()])


class RayFan:
    """A fan of rays stacked into (M, N) arrays along the launch-angle axis."""

    def __init__(self, Rays: list = None):
        if Rays is None:
            return  # internal: populated by from_arrays
        thetas, rs, ts, zs, ps, n_botts, n_surfs, source_depths = (
            [] for _ in range(8)
        )
        for ray in Rays:
            thetas.append(ray.launch_angle)
            rs.append(ray.r)
            ts.append(ray.t)
            zs.append(ray.z)
            ps.append(ray.p)
            n_botts.append(ray.n_bottom)
            n_surfs.append(ray.n_surface)
            source_depths.append(getattr(ray, "source_depth", np.nan))
        self.thetas = np.array(thetas)
        self.rs = np.array(rs)
        self.ts = np.array(ts)
        self.zs = np.array(zs)
        self.ps = np.array(ps)
        self.n_botts = np.array(n_botts)
        self.n_surfs = np.array(n_surfs)
        self.source_depths = np.array(source_depths)
        self.compute_rayids()

    @classmethod
    def from_arrays(cls, thetas, rs, ts, zs, ps, n_botts, n_surfs, source_depths):
        """Build directly from batched arrays (user sign convention)."""
        self = cls()
        self.thetas = np.asarray(thetas)
        self.rs = np.asarray(rs)
        self.ts = np.asarray(ts)
        self.zs = np.asarray(zs)
        self.ps = np.asarray(ps)
        self.n_botts = np.asarray(n_botts)
        self.n_surfs = np.asarray(n_surfs)
        self.source_depths = np.asarray(source_depths)
        self.compute_rayids()
        return self

    def compute_rayids(self):
        """Signed turning-point count per ray, "b"-suffixed on boundary hits
        (reference `ray_objects.py:138-155`)."""
        ray_ids = np.sum(np.diff(np.sign(self.ps)) != 0, axis=1) * np.sign(self.thetas)
        b_mask = (self.n_botts == 0) & (self.n_surfs == 0)
        ray_ids_str = [
            str(ray_ids[i]) if b_mask[i] else f"{ray_ids[i]}b"
            for i in range(self.rs.shape[0])
        ]
        self.ray_ids = np.array(ray_ids_str)

    # -- plotting -------------------------------------------------------
    def plot_time_front(
        self, include_lines=False, range_idx=-1, add_colorbar=True, ray_id=False, **kwargs
    ):
        from matplotlib import pyplot as plt

        if include_lines:
            plt.plot(
                self.ts[:, range_idx], self.zs[:, range_idx],
                c="#aaaaaa", lw=0.5, zorder=5,
            )
        scatter_kwargs = {"c": self.thetas, "cmap": "viridis", "s": 2, "lw": 0, "zorder": 6}
        scatter_kwargs.update(kwargs)
        if ray_id:
            unique_categories = np.unique(self.ray_ids)
            colors = plt.cm.tab20(np.linspace(0, 1, len(unique_categories)))
            category_to_color = dict(zip(unique_categories, colors))
            scatter_kwargs.update(
                {"c": [category_to_color[cat] for cat in self.ray_ids]}
            )
            add_colorbar = False
            for i, cat in enumerate(unique_categories):
                plt.scatter([], [], c=[colors[i]], label=cat)
            plt.legend(ncols=3, loc="lower left")
        plt.scatter(x=self.ts[:, range_idx], y=self.zs[:, range_idx], **scatter_kwargs)
        plt.ylim([self.zs.min(), self.zs.max()])
        if add_colorbar:
            plt.colorbar(label="launch angle [degrees]")
            plt.xlabel("time [s]")
            plt.ylabel("depth [m]")
            plt.title("Time Front")

    def plot_ray_fan(self, **kwargs):
        from matplotlib import pyplot as plt

        alpha_val = 10.0 / len(self.thetas)
        if alpha_val > 1 or alpha_val < 0:
            alpha_val = 1
        plot_kwargs = {"c": "k", "lw": 1, "alpha": alpha_val}
        plot_kwargs.update(kwargs)
        plt.plot(self.rs.T, self.zs.T, **plot_kwargs)
        plt.xlabel("range [m]")
        plt.ylabel("depth [m]")
        plt.ylim([self.zs.min(), self.zs.max()])
        plt.title("Ray Fan")

    def plot_depth_v_angle(self, include_line=False, **kwargs):
        from matplotlib import pyplot as plt

        if include_line:
            plt.plot(self.thetas, self.zs[:, -1], c="#aaaaaa", lw=0.5, zorder=5)
        plt.scatter(x=self.thetas, y=self.zs[:, -1], **kwargs)

    # -- persistence ----------------------------------------------------
    def save_mat(self, filename):
        from scipy import io

        data = {
            "rayfan": {
                "thetas": self.thetas,
                "xs": self.rs,
                "ts": self.ts,
                "zs": self.zs,
                "ps": self.ps,
                "n_botts": self.n_botts,
                "n_surfs": self.n_surfs,
                "source_depths": self.source_depths,
            }
        }
        io.savemat(filename, data)

    def save_npz(self, filename):
        """Numpy-native export (round-trips with ``RayFan.load_npz``)."""
        np.savez(
            filename,
            thetas=self.thetas, rs=self.rs, ts=self.ts, zs=self.zs, ps=self.ps,
            n_botts=self.n_botts, n_surfs=self.n_surfs,
            source_depths=self.source_depths,
        )

    @classmethod
    def load_npz(cls, filename):
        d = np.load(filename)
        return cls.from_arrays(
            d["thetas"], d["rs"], d["ts"], d["zs"], d["ps"],
            d["n_botts"], d["n_surfs"], d["source_depths"],
        )

    # -- container protocol ---------------------------------------------
    def __add__(self, other):
        if not isinstance(other, RayFan):
            raise TypeError("Can only add RayFan objects together")
        if not np.array_equal(self.rs[0], other.rs[0]):
            raise ValueError("Range arrays (rs) must be equivalent for concatenation")
        return RayFan.from_arrays(
            np.concatenate([self.thetas, other.thetas]),
            np.concatenate([self.rs, other.rs]),
            np.concatenate([self.ts, other.ts]),
            np.concatenate([self.zs, other.zs]),
            np.concatenate([self.ps, other.ps]),
            np.concatenate([self.n_botts, other.n_botts]),
            np.concatenate([self.n_surfs, other.n_surfs]),
            np.concatenate([self.source_depths, other.source_depths]),
        )

    def __len__(self):
        return len(self.thetas)

    def __getitem__(self, key):
        if isinstance(key, (int, np.integer)):
            key = int(key)
            if key < 0:
                key = len(self.thetas) + key
            if key < 0 or key >= len(self.thetas):
                raise IndexError(
                    f"Index {key} is out of bounds for RayFan with "
                    f"{len(self.thetas)} rays"
                )
            return Ray(
                r=self.rs[key],
                y=np.array([self.ts[key], -self.zs[key], -self.ps[key]]),
                n_bottom=self.n_botts[key],
                n_surface=self.n_surfs[key],
                launch_angle=self.thetas[key],
                source_depth=self.source_depths[key],
            )
        if isinstance(key, slice):
            idx = np.arange(len(self.thetas))[key]
        else:
            idx = np.asarray(key)
            if idx.dtype == bool:
                idx = np.where(idx)[0]
            if np.isscalar(idx) or idx.ndim == 0:
                idx = np.array([int(idx)])
            elif idx.ndim != 1:
                raise ValueError("Invalid indexing array shape")
        return RayFan.from_arrays(
            self.thetas[idx], self.rs[idx], self.ts[idx], self.zs[idx],
            self.ps[idx], self.n_botts[idx], self.n_surfs[idx],
            self.source_depths[idx],
        )


class EigenRays:
    """Eigenrays grouped per receiver depth (reference `ray_objects.py:433-548`).

    ``received_angles`` are computed at the ray endpoint against the
    *untransformed* environment, matching the reference.
    """

    def __init__(
        self,
        receiver_depths,
        eigenray_dict,
        environment,
        num_eigenrays,
        num_eigenrays_found,
        failed_eray_theta_brackets,
    ):
        self.receiver_depths = receiver_depths
        self.rs = {}
        self.ts = {}
        self.zs = {}
        self.ps = {}
        self.received_angles = {}
        self.launch_angles = {}
        self.n_botts = {}
        self.n_surfs = {}
        self.ray_id = {}
        self.ray_id_int = {}
        self.num_eigenrays = num_eigenrays
        self.num_eigenrays_found = num_eigenrays_found
        self.failed_eray_theta_brackets = failed_eray_theta_brackets

        if hasattr(environment, "unpack"):
            cin, _, rin, zin, *_ = environment.unpack(flatearth=False)
        else:  # bare EnvData pytree
            cin = np.asarray(environment.c, float)
            rin = np.asarray(environment.r, float)
            zin = np.asarray(environment.z, float)

        from .ops.host import bilinear_np

        for ridx in range(len(receiver_depths)):
            rays = eigenray_dict[ridx]
            if len(rays) == 0:
                for d in (self.rs, self.ts, self.zs, self.ps):
                    d[ridx] = np.zeros((0, 0))
                self.n_botts[ridx] = np.zeros(0, int)
                self.n_surfs[ridx] = np.zeros(0, int)
                self.received_angles[ridx] = np.zeros(0)
                self.launch_angles[ridx] = np.zeros(0)
                self.ray_id[ridx] = np.array([], dtype=str)
                self.ray_id_int[ridx] = np.array([], dtype=int)
                continue
            fan = RayFan(rays)
            self.rs[ridx] = fan.rs
            self.ts[ridx] = fan.ts
            self.zs[ridx] = fan.zs
            self.ps[ridx] = fan.ps
            self.n_botts[ridx] = fan.n_botts
            self.n_surfs[ridx] = fan.n_surfs

            received, rids, rids_int = [], [], []
            for k in range(fan.rs.shape[0]):
                c = bilinear_np(fan.rs[k, -1], fan.zs[k, -1], rin, zin, cin)
                theta = np.degrees(np.arcsin(np.clip(fan.ps[k, -1] * c, -1, 1)))
                received.append(theta)
                rid = np.sum(np.diff(np.sign(fan.ps[k, :])) != 0) * np.sign(
                    fan.thetas[k]
                )
                flag = "" if (fan.n_botts[k] == 0 and fan.n_surfs[k] == 0) else "b"
                rids.append(f"{rid}{flag}")
                rids_int.append(int(rid))
            self.received_angles[ridx] = np.array(received)
            self.launch_angles[ridx] = fan.thetas
            self.ray_id[ridx] = np.array(rids)
            self.ray_id_int[ridx] = np.array(rids_int)

    # -- plotting -------------------------------------------------------
    def plot_angle_time(self, ridxs=None, **kwargs):
        from matplotlib import pyplot as plt

        if ridxs is None:
            ridxs = list(self.received_angles.keys())
        for ridx in ridxs:
            plt.scatter(self.ts[ridx][:, -1], self.received_angles[ridx], **kwargs)
        plt.xlabel("time [s]")
        plt.ylabel("received angle [deg]")
        plt.title("Received Angle vs Time")

    def plot(self, ridxs=[0], **kwargs):
        from matplotlib import pyplot as plt

        if isinstance(ridxs, int):
            ridxs = [ridxs]
        ray_kwargs = {"c": "k"}
        ray_kwargs.update(kwargs)
        for ridx in ridxs:
            plt.plot(self.rs[ridx].T, self.zs[ridx].T, **ray_kwargs)
        plt.xlabel("range [m]")
        plt.ylabel("depth [m]")
        plt.title("Eigen Rays")
        plt.ylim([self.zs[ridx].min(), self.zs[ridx].max()])

    def plot_ducted(self, **kwargs):
        from matplotlib import pyplot as plt

        ray_kwargs = {"c": "k"}
        ray_kwargs.update(kwargs)
        for ridx in self.ray_id.keys():
            mask = (self.n_botts[ridx] == 0) & (self.n_surfs[ridx] == 0)
            plt.plot(self.rs[ridx][mask].T, -self.zs[ridx][mask].T, **ray_kwargs)
        plt.xlabel("range [m]")
        plt.ylabel("depth [m]")
        plt.title("Ducted Eigen Rays")

    def save_mat(self, filename):
        from scipy import io

        data = {}
        for ridx, rdepth in enumerate(self.receiver_depths):
            data[f"receiver_depth_{ridx}"] = {
                "receiver_depth": rdepth,
                "xs": self.rs[ridx],
                "ts": self.ts[ridx],
                "zs": self.zs[ridx],
                "ps": self.ps[ridx],
                "received_angles": self.received_angles[ridx],
                "launch_angles": self.launch_angles[ridx],
                "ray_id": self.ray_id[ridx],
                "ray_id_int": self.ray_id_int[ridx],
                "n_bottom": self.n_botts[ridx],
                "n_surface": self.n_surfs[ridx],
                "source_depth": getattr(self, "source_depths", {}).get(ridx, np.nan)
                if hasattr(self, "source_depths")
                else np.nan,
                "num_eigenrays": self.num_eigenrays,
                "num_eigenrays_found": self.num_eigenrays_found,
            }
        io.savemat(filename, {"eigenrays": data})
