* Fixed-format torture: markers, blank bound-set name, field-3 $ comment.
* Hand optimum: x=1, y=2, obj = -5
NAME          FIXMARK
ROWS
 N  OBJ ROW
 L  CAP ROW
COLUMNS
    MK 1      'MARKER'                 'INTORG'
    X INT     OBJ ROW   -1.0           CAP ROW   1.0
    MK 2      'MARKER'                 'INTEND'
    Y VAR     OBJ ROW   -2.0           CAP ROW   1.0
RHS
    RHS       $ this whole line is a comment via field 3
    RHS       CAP ROW   3.0
BOUNDS
 UP           X INT     2.0
 UP BND       Y VAR     2.0
ENDATA
