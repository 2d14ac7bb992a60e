from .scheduler import ContinuousBatchingEngine, Request, RequestState

__all__ = ["ContinuousBatchingEngine", "Request", "RequestState"]
