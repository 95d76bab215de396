package graft

/** Exception taxonomy mirroring the reference's
  * `sql_autoloader/exceptions.py:1-85` (18 types rooted at
  * SQLAutoloaderError, split dataframe-ops vs schema errors).
  */
class GraftError(message: String) extends RuntimeException(message)

// ---- Errors in dataframe operations (exceptions.py:7-24)
class MissingKeysAfterMergeError(m: String) extends GraftError(m)
class MatchDatatypesError(m: String) extends GraftError(m)
class InsertingDataFailedError(m: String) extends GraftError(m)
class CompareMissingRowsError(m: String) extends GraftError(m)
class CompareNoExactMatchError(m: String) extends GraftError(m)

// ---- SchemaError and children (exceptions.py:28-77)
class SchemaError(m: String) extends GraftError(m)
class EmptySchemaError(m: String) extends GraftError(m)
class TableDoesNotExistError(m: String) extends SchemaError(m)
class EmptyColumnListError(m: String) extends SchemaError(m)
class NoSuchColumnForTableError(m: String) extends SchemaError(m)
class NoSuchColumnInSchemaError(m: String) extends SchemaError(m)
class ColumnsDoNotExistOnTableError(m: String) extends SchemaError(m)
class ColumnIsAmbiguousError(m: String) extends SchemaError(m)
class NoPrimaryKeyError(m: String) extends SchemaError(m)
class AliasDoesNotExistError(m: String) extends SchemaError(m)
class AmbiguousAliasesError(m: String) extends SchemaError(m)
class IsolatedTablesError(m: String) extends SchemaError(m)
class IsolatedSubgraphsError(m: String) extends SchemaError(m)

// ---- Model validation errors (exceptions.py:80-85)
class InvalidTableError(m: String) extends GraftError(m)
class InvalidReferenceError(m: String) extends GraftError(m)
