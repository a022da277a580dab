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
