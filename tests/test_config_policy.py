"""KernelPolicy: the one config surface for measured kernel knobs
(SURVEY.md §5 "one dataclass/CLI config surface"; VERDICT r4 #6 — no
module-level policy globals consumed at trace time)."""

import dataclasses

from tpurt.config import DEFAULT_KERNEL_POLICY, KernelPolicy, RenderConfig


def test_default_profile_is_the_measured_production_configuration():
    """Pin the production profile (docs/PERFORMANCE.md): a change to any
    default is a deliberate re-measurement, not an accident."""
    p = KernelPolicy()
    assert p.sort_wave0 is False
    assert p.sort_retrace is False
    assert p.pair_closest is False and p.pair_occlusion is False
    assert p.dual_closest is False and p.dual_occlusion is False
    assert p.descend_closest is False and p.descend_occlusion is False
    assert p.cell_masks_closest is True
    assert p.octet_closest == 0 and p.octet_occlusion == 0
    assert p.sup_closest == 2 and p.sup_occlusion == 4
    assert p.sumcol is True
    assert p.unroll == 4
    assert p.arity == 16
    assert p.resident_budget == 104 * 2 ** 20


def test_render_config_carries_the_default_policy():
    assert RenderConfig().kernel == DEFAULT_KERNEL_POLICY


def test_policy_is_hashable_and_overridable():
    """Frozen dataclass: usable as a static jit argument; overrides via
    dataclasses.replace, no source edits (the VERDICT's reproducibility
    bar for benchmark configurations)."""
    p = dataclasses.replace(KernelPolicy(), cell_masks_closest=False,
                            unroll=8)
    assert hash(p) != hash(KernelPolicy())
    assert p.unroll == 8 and not p.cell_masks_closest
    cfg = RenderConfig(kernel=p)
    assert cfg.kernel.unroll == 8


def test_no_module_level_policy_globals_remain():
    """Grep-equivalent in test form: the old global names must be gone
    from the trace-time modules."""
    import tpurt.bvh.traverse as TR
    import tpurt.integrator.wavefront as W

    for name in ("WIDE_PAIR_CLOSEST", "WIDE_DUAL_CLOSEST",
                 "WIDE_PAIR_OCCLUSION", "WIDE_DUAL_OCCLUSION",
                 "WIDE_DESCEND_CLOSEST", "WIDE_DESCEND_OCCLUSION",
                 "WIDE_CELL_MASKS_CLOSEST", "WIDE_OCTET_CLOSEST",
                 "WIDE_OCTET_OCCLUSION"):
        assert not hasattr(TR, name), name
    for name in ("SORT_WAVE0", "SORT_RETRACE"):
        assert not hasattr(W, name), name
