"""UV species package: registers each species with the central registry."""

from animal_vision_tpu.species import register


def _lazy(modname: str, clsname: str):
    def factory():
        import importlib

        mod = importlib.import_module(f"animal_vision_tpu.species.uv.{modname}")
        return getattr(mod, clsname)()

    return factory


register("honeybee", "HoneyBee", _lazy("honeybee", "HoneyBee"))
register("reindeer", "ReinDeer", _lazy("reindeer", "Reindeer"))
register("goldfish", "GoldFish", _lazy("goldfish", "Goldfish"))
register("rat_uv", "RatUV", _lazy("rat_uv", "RatUV"))
register("damselfish", "DamselFish", _lazy("damselfish", "Damselfish"))
register("anableps", "Anableps (Four-eyed fish)", _lazy("anableps", "Anableps"))
register("anchovy", "Northern Anchovy Fish", _lazy("anchovy", "Anchovy"))
register("guppy", "Guppy Fish", _lazy("guppy", "Guppy"))
def _morpho_factory():
    """Morpho honors ANIMAL_VISION_MORPHO_GATE (a float, e.g. 1e-2): flat
    frames then render deterministically instead of amplifying arctangent
    noise (PARITY.md "morpho flat frames"). Unset = exact reference
    behavior. The CLI's --morpho-gate flag sets this env before lookup."""
    import importlib
    import os

    mod = importlib.import_module("animal_vision_tpu.species.uv.morpho")
    animal = mod.Morpho()
    gate = os.environ.get("ANIMAL_VISION_MORPHO_GATE")
    if gate:
        animal.orientation_gate = float(gate)
    return animal


register("morpho", "Morpho Butterfly", _morpho_factory)
register("heliconius", "Heliconius Butterfly", _lazy("heliconius", "Heliconius"))
register("pieris", "Pieris Butterfly", _lazy("pieris", "Pieris"))
register("mantis_shrimp", "Mantis Shrimp", _lazy("mantis_shrimp", "MantisShrimp"))
register("kestrel", "Kestrel", _lazy("kestrel", "Kestrel"))
register("jumping_spider", "Jumping Spider", _lazy("jumping_spider", "JumpingSpider"))
register("dragonfly", "DragonFly", _lazy("dragonfly", "Dragonfly"))
register("hummingbird", "HummingBird", _lazy("hummingbird", "Hummingbird"))
