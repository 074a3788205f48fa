from . import modeldata, synthetic
