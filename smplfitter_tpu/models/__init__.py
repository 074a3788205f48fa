from .bodymodel import BodyModel
