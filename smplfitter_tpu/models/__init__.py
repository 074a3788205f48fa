from .bodymodel import BodyModel
from .bodyfitter import BodyFitter
