DELETE FROM resources w WHERE w."path" = '/things';

INSERT INTO resources ("href", "key", "modified", "jsondata", "resourcetype", "path") SELECT "href", "key", "modified", "jsondata", "resourcetype", "path" FROM stg;
