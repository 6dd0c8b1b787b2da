from multimeditron_tpu.serve.engine import EngineConfig, Request, ServingEngine

__all__ = ["EngineConfig", "Request", "ServingEngine"]
