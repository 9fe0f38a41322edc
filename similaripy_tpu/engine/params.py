"""S-Plus kernel parameterization.

One generalized similarity kernel covers all nine public similarity
functions (reference: similaripy/cython_code/s_plus.h:129-156):

    T(x,y)  = t1*(Xt[r] - xy) + t2*(Yt[c] - xy) + xy        (raw xy!)
    C(x,y)  = Xc[r] * Yc[c]
    D(x,y)  = Xd[r] * Yd[c]
    xy_p    = xy**a1 if a1 != 1 else xy
    denom   = l1*T + l2*C + l3*D + stabilized_shrink
    val     = xy_p / denom      if any of {l1,l2,l3,stab,bayes} nonzero
              (0 when denom == 0)
            = xy (raw)          otherwise
    if bayesian_shrink: val *= xy_p / (xy_p + bayesian_shrink)
    keep if val >= threshold

Numeric quirks preserved on purpose (SURVEY §7 "hard parts" #6): the
Tversky term uses raw xy while the numerator uses xy**a1; denominator==0
yields 0; with no normalization terms the raw (un-powered) xy is returned.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class SPlusParams:
    a1: float = 1.0
    l1: float = 0.0
    l2: float = 0.0
    l3: float = 0.0
    t1: float = 1.0
    t2: float = 1.0
    stabilized_shrink: float = 0.0
    bayesian_shrink: float = 0.0
    threshold: float = 0.0

    @property
    def use_l1(self) -> bool:
        return self.l1 != 0.0

    @property
    def use_l2(self) -> bool:
        return self.l2 != 0.0

    @property
    def use_l3(self) -> bool:
        return self.l3 != 0.0

    @property
    def use_pow(self) -> bool:
        return self.a1 != 1.0

    @property
    def use_bayes(self) -> bool:
        return self.bayesian_shrink != 0.0

    @property
    def use_denominator(self) -> bool:
        return (
            self.use_l1
            or self.use_l2
            or self.use_l3
            or self.stabilized_shrink != 0.0
            or self.use_bayes
        )

    def static_flags(self) -> tuple:
        """Hashable compile-time branch configuration for jit specialization."""
        return (
            self.use_l1,
            self.use_l2,
            self.use_l3,
            self.use_pow,
            self.use_bayes,
            self.use_denominator,
        )
