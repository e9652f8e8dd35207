"""Exception hierarchy mirroring the reference's checked exceptions.

Reference: jwave/exceptions/JWaveException.java:32, JWaveFailure.java:32 —
``JWaveException ⊃ {JWaveError, JWaveFailure ⊃ NotAllocated/NotFound/
NotImplemented/NotKnown/NotValid}``. Unlike the reference facade (which
catches and prints, Transform.java:83-89), this API raises.
"""


class JWaveException(Exception):
    """Base of all jwave_tpu errors."""


class JWaveError(JWaveException):
    """Non-recoverable internal error."""


class JWaveFailure(JWaveException):
    """Recoverable failure caused by bad input (wrong length, unknown name, ...)."""


class JWaveNotAllocated(JWaveFailure):
    pass


class JWaveNotFound(JWaveFailure):
    pass


class JWaveNotImplemented(JWaveFailure):
    pass


class JWaveNotKnown(JWaveFailure):
    pass


class JWaveNotValid(JWaveFailure):
    pass
