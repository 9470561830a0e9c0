from objcavit_tpu.language.strategy import ObjectLanguageStrategy

__all__ = ["ObjectLanguageStrategy"]
