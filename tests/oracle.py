"""Golden oracle: a faithful sequential NumPy model of the reference solver.

This is the fidelity baseline prescribed by SURVEY.md §4(b): a host-side
reimplementation of the *behavior* of the reference's ``_step``
(``/root/reference/simulation_handler.lua:1722-1989``) — sequential
Gauss-Seidel pair projection in particle order, dict-based spatial hash,
unique-pair dedup, collision budget, literal (inert) cohesion branch — used to
gate the TPU solver's trajectories. It is deliberately slow and simple.

``clean_hash=True`` (default) clears the spatial hash and pair set before
*every* collision pass; ``False`` reproduces the reference's
persist-across-substeps quirk (SURVEY.md §5.2: cleared between passes within a
substep at :1905-1912 and at env creation at :1375-1377, but not between
substeps — rebuilds append onto stale tables).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

EPS = 1e-8


@dataclass
class OracleConfig:
    damping: float = 0.1
    follow_strength: float = 1 - 0.004
    cohesion_strength: float = 1 - 0.2
    cohesion_interaction_distance_factor: float = 2.0
    collision_strength: float = 1 - 0.0025
    collision_overlap_factor: float = 2.0
    min_mass: float = 1.0
    max_mass: float = 1.8
    min_radius: float = 4.0
    max_radius: float = 4.0


@dataclass
class OraclePopulation:
    cfg: OracleConfig
    pos: List[List[float]] = field(default_factory=list)     # [x, y]
    prev: List[List[float]] = field(default_factory=list)
    vel: List[List[float]] = field(default_factory=list)
    radius: List[float] = field(default_factory=list)
    mass_t: List[float] = field(default_factory=list)
    inv_mass: List[float] = field(default_factory=list)
    batch_id: List[int] = field(default_factory=list)
    cell: List[Tuple[int, int]] = field(default_factory=list)
    spatial_hash: Dict[Tuple[int, int], List[int]] = field(default_factory=dict)
    collided: set = field(default_factory=set)

    @property
    def n(self) -> int:
        return len(self.pos)


def _mix(a, b, t):
    return a * (1 - t) + b * t


def _mass_t(i: int, n: int, variance: float = 4.0) -> float:
    def butterworth(t):
        return 1.0 / (1.0 + (variance * (t - 0.5)) ** 4)
    left, right = (i - 0.5) / n, (i + 0.5) / n
    center, hw = 0.5 * (left + right), 0.5 * (right - left)
    return 0.5 * (butterworth(center - hw / math.sqrt(3))
                  + butterworth(center + hw / math.sqrt(3)))


def fibonacci_offsets(n: int, rx: float, ry: float):
    golden = 2 * math.pi / (((1 + math.sqrt(5)) / 2) ** 2)
    out = []
    for i in range(1, n + 1):
        r = math.sqrt((i - 1) / n)
        th = i * golden
        out.append((r * rx * math.cos(th), r * ry * math.sin(th)))
    return out


class OracleSim:
    """Two-population sequential simulator with the reference's step semantics."""

    def __init__(self, white_cfg: OracleConfig = None, yolk_cfg: OracleConfig = None):
        self.white = OraclePopulation(white_cfg or OracleConfig())
        self.yolk = OraclePopulation(yolk_cfg or OracleConfig(
            cohesion_strength=1 - 0.002, cohesion_interaction_distance_factor=3.0,
            collision_strength=1 - 0.001, max_mass=1.35))
        self.targets: Dict[int, Tuple[float, float]] = {}
        self.batch_radius: Dict[int, Tuple[float, float]] = {}  # (white_r, yolk_r)
        self._next_id = 1

    # ---------------------------------------------------------------- build --

    def add_batch(self, x, y, white_radius, yolk_radius, n_white, n_yolk) -> int:
        bid = self._next_id
        self._next_id += 1
        self.targets[bid] = (x, y)
        self.batch_radius[bid] = (white_radius, yolk_radius)
        for pop, rad, n in ((self.white, white_radius, n_white),
                            (self.yolk, yolk_radius, n_yolk)):
            for i, (dx, dy) in enumerate(fibonacci_offsets(n, rad, rad), start=1):
                t = _mass_t(i, n)
                mass = max(_mix(pop.cfg.min_mass, pop.cfg.max_mass, t), 1e-12)
                pop.pos.append([x + dx, y + dy])
                pop.prev.append([x + dx, y + dy])
                pop.vel.append([0.0, 0.0])
                pop.mass_t.append(t)
                pop.radius.append(_mix(pop.cfg.min_radius, pop.cfg.max_radius, t))
                pop.inv_mass.append(1.0 / mass)
                pop.batch_id.append(bid)
                pop.cell.append((0, 0))
        return bid

    # ----------------------------------------------------------------- step --

    def step(self, delta: float, n_substeps: int = 2, n_collision_steps: int = 3,
             clean_hash: bool = True):
        sub_dt = max(delta / n_substeps, EPS)
        for pop in (self.white, self.yolk):
            pop.spatial_hash.clear()
            pop.collided.clear()

        for _ in range(n_substeps):
            for pop in (self.white, self.yolk):
                self._pre_solve(pop, sub_dt)
                self._follow(pop, sub_dt)
            for ci in range(n_collision_steps):
                for pop in (self.white, self.yolk):
                    if clean_hash:
                        pop.spatial_hash.clear()
                        pop.collided.clear()
                    self._rebuild_hash(pop)
                    self._solve_collision(pop, sub_dt)
                if not clean_hash and ci < n_collision_steps - 1:
                    for pop in (self.white, self.yolk):
                        pop.spatial_hash.clear()
                        pop.collided.clear()
            for pop in (self.white, self.yolk):
                self._post_solve(pop, sub_dt)

    def _compliance(self, strength, sub_dt):
        return (1.0 - min(max(strength, 0.0), 1.0)) / (sub_dt * sub_dt)

    def _pre_solve(self, pop: OraclePopulation, dt: float):
        damp = 1.0 - min(max(pop.cfg.damping, 0.0), 1.0)
        for i in range(pop.n):
            pop.prev[i][0], pop.prev[i][1] = pop.pos[i]
            pop.vel[i][0] *= damp
            pop.vel[i][1] *= damp
            pop.pos[i][0] += dt * pop.vel[i][0]
            pop.pos[i][1] += dt * pop.vel[i][1]
            mass = max(_mix(pop.cfg.min_mass, pop.cfg.max_mass, pop.mass_t[i]), 1e-12)
            pop.inv_mass[i] = 1.0 / mass
            pop.radius[i] = _mix(pop.cfg.min_radius, pop.cfg.max_radius, pop.mass_t[i])

    def _follow(self, pop: OraclePopulation, sub_dt: float):
        compliance = self._compliance(pop.cfg.follow_strength, sub_dt)
        which = 0 if pop is self.white else 1
        for i in range(pop.n):
            bid = pop.batch_id[i]
            fx, fy = self.targets[bid]
            target_distance = 2.0 * math.sqrt(self.batch_radius[bid][which])
            x, y = pop.pos[i]
            dist = math.hypot(fx - x, fy - y)
            w = pop.inv_mass[i]
            if w > EPS and dist > target_distance:
                if dist < EPS:
                    continue
                dx, dy = (fx - x) / dist, (fy - y) / dist
                dl = (dist - target_distance) / (w + compliance)
                pop.pos[i][0] += dx * dl * w
                pop.pos[i][1] += dy * dl * w

    def _cell_size(self, pop):
        f = max(pop.cfg.collision_overlap_factor,
                pop.cfg.cohesion_interaction_distance_factor)
        return max(1.0, pop.cfg.max_radius * f)

    def _rebuild_hash(self, pop: OraclePopulation):
        cs = self._cell_size(pop)
        for i in range(pop.n):
            cx = math.floor(pop.pos[i][0] / cs)
            cy = math.floor(pop.pos[i][1] / cs)
            pop.cell[i] = (cx, cy)
            pop.spatial_hash.setdefault((cx, cy), []).append(i)

    @staticmethod
    def _enforce_distance(ax, ay, bx, by, wa, wb, target, compliance):
        dx, dy = bx - ax, by - ay
        dist = math.hypot(dx, dy)
        if dist < EPS:
            dx = dy = 0.0
        else:
            dx, dy = dx / dist, dy / dist
        violation = dist - target
        divisor = wa + wb + compliance
        if divisor < EPS:
            return 0.0, 0.0, 0.0, 0.0
        corr = -violation / divisor
        m = abs(violation)
        corr = min(max(corr, -m), m)
        return -dx * corr * wa, -dy * corr * wa, dx * corr * wb, dy * corr * wb

    def _solve_collision(self, pop: OraclePopulation, sub_dt: float):
        coll_c = self._compliance(pop.cfg.collision_strength, sub_dt)
        coh_c = self._compliance(pop.cfg.cohesion_strength, sub_dt)
        max_n = 0.05 * pop.n ** 2
        n_collided = 0
        for i in range(pop.n):
            wi, ri, bi = pop.inv_mass[i], pop.radius[i], pop.batch_id[i]
            cx, cy = pop.cell[i]
            for ox in (-1, 0, 1):
                for oy in (-1, 0, 1):
                    for j in pop.spatial_hash.get((cx + ox, cy + oy), ()):
                        if i == j:
                            continue
                        key = (min(i, j), max(i, j))
                        if key in pop.collided:
                            continue
                        pop.collided.add(key)
                        wj, rj, bj = pop.inv_mass[j], pop.radius[j], pop.batch_id[j]
                        if wi + wj < EPS:
                            continue
                        # cohesion — literal reference semantics (inert unless
                        # exactly coincident; :1603-1630)
                        if bi == bj:
                            interaction = 0.0
                            xi, yi = pop.pos[i]
                            xj, yj = pop.pos[j]
                            if (xj - xi) ** 2 + (yj - yi) ** 2 <= interaction ** 2:
                                c = self._enforce_distance(xi, yi, xj, yj, wi, wj,
                                                           interaction, coh_c)
                                pop.pos[i][0] += c[0]
                                pop.pos[i][1] += c[1]
                                pop.pos[j][0] += c[2]
                                pop.pos[j][1] += c[3]
                        # collision
                        min_d = pop.cfg.collision_overlap_factor * (ri + rj)
                        xi, yi = pop.pos[i]
                        xj, yj = pop.pos[j]
                        if (xj - xi) ** 2 + (yj - yi) ** 2 <= min_d ** 2:
                            c = self._enforce_distance(xi, yi, xj, yj, wi, wj,
                                                       min_d, coll_c)
                            pop.pos[i][0] += c[0]
                            pop.pos[i][1] += c[1]
                            pop.pos[j][0] += c[2]
                            pop.pos[j][1] += c[3]
                        n_collided += 1
                        if n_collided >= max_n:
                            return

    def _post_solve(self, pop: OraclePopulation, dt: float):
        for i in range(pop.n):
            pop.vel[i][0] = (pop.pos[i][0] - pop.prev[i][0]) / dt
            pop.vel[i][1] = (pop.pos[i][1] - pop.prev[i][1]) / dt

    # -------------------------------------------------------------- queries --

    def positions(self, which: str) -> np.ndarray:
        pop = self.white if which == "white" else self.yolk
        return np.asarray(pop.pos, np.float64)

    def centroid(self, which: str) -> np.ndarray:
        return self.positions(which).mean(axis=0)
